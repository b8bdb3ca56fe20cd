"""Range coder + exp-Golomb + header round-trip tests."""

import numpy as np
import pytest

from coolchic_tpu.bitstream import rangecoder as rc
from coolchic_tpu.bitstream.expgolomb import decode_exp_golomb, encode_exp_golomb
from coolchic_tpu.bitstream.fixedpoint import arm_to_fixed_point, fixed_point_arm_np
from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
from coolchic_tpu.core.constants import non_zero_pixel_ctx_index

RNG = np.random.default_rng(42)


def test_mu_scale_table_is_normative():
    mu, scale = rc.load_mu_scale_tables()
    assert mu.size == 32768 and scale.size == 2561
    # mu is an exact arange
    np.testing.assert_array_equal(
        mu, np.arange(-64, 64, 2**-8, dtype=np.float64).astype(np.float32))
    # scale is within 1 ulp of exp(arange) (the table itself is the authority)
    approx = np.exp(np.arange(-5, 5 + 2**-8, 2**-8, dtype=np.float64)).astype(np.float32)
    np.testing.assert_allclose(scale, approx, rtol=3e-7)


def test_rangecoder_roundtrip_raw():
    n = 5000
    symbols = np.clip(np.round(RNG.standard_normal(n) * 5), -64, 63).astype(np.int32)
    mu = (RNG.standard_normal(n) * 3).astype(np.float64)
    scale = np.exp(RNG.uniform(-4, 2, n)).astype(np.float64)

    enc = rc.RangeEncoder()
    enc.encode_raw(symbols, mu, scale)
    payload = enc.get_bytes()
    assert len(payload) % 4 == 0 and len(payload) > 0

    dec = rc.RangeDecoder(payload)
    out = dec.decode_raw(mu, scale)
    np.testing.assert_array_equal(out, symbols)


def test_rangecoder_roundtrip_idx():
    n = 2000
    symbols = np.clip(np.round(RNG.standard_normal(n) * 20), -64, 63).astype(np.int32)
    idx_mu = RNG.integers(-100, 33000, n)
    idx_sc = RNG.integers(-10, 2600, n)

    enc = rc.RangeEncoder()
    enc.encode_idx(symbols, idx_mu, idx_sc)
    dec = rc.RangeDecoder(enc.get_bytes())
    np.testing.assert_array_equal(dec.decode_idx(idx_mu, idx_sc), symbols)


def test_rangecoder_rate_is_close_to_entropy():
    """The coded size should be within ~1% of the Laplace entropy."""
    n = 40000
    b = 4.0
    x = RNG.laplace(0, b, n)
    symbols = np.clip(np.round(x), -64, 63).astype(np.int32)
    mu = np.zeros(n)
    scale = np.full(n, b)
    enc = rc.RangeEncoder()
    enc.encode_raw(symbols, mu, scale)
    n_bits = len(enc.get_bytes()) * 8

    def cdf(v):
        return np.where(v < 0, 0.5 * np.exp(v / b), 1 - 0.5 * np.exp(-v / b))
    p = np.maximum(cdf(symbols + 0.5) - cdf(symbols - 0.5), 2**-24)
    entropy_bits = -np.log2(p).sum()
    assert n_bits < entropy_bits * 1.02 + 64


def test_expgolomb_roundtrip():
    data = np.concatenate([
        RNG.integers(-500, 500, 300),
        np.array([0, 1, -1, 65535, -65535]),
    ])
    for k in [0, 1, 3, 7, 12]:
        count = np.full(data.size, k)
        payload, pad = encode_exp_golomb(data, count)
        out = decode_exp_golomb(payload, pad, count)
        np.testing.assert_array_equal(out, data)

    # mixed orders
    count = RNG.integers(0, 13, data.size)
    payload, pad = encode_exp_golomb(data, count)
    np.testing.assert_array_equal(decode_exp_golomb(payload, pad, count), data)


def test_expgolomb_matches_reference_convention():
    """Spot-check bit layout against hand-derived values.

    x=0 -> u=0; order 0: v=0, code '1'. x=1 -> u=1: code '010'.
    """
    payload, pad = encode_exp_golomb([0], [0])
    assert pad == 7 and payload == bytes([0b00000001])
    payload, pad = encode_exp_golomb([1], [0])
    assert pad == 5 and payload == bytes([0b00000010])


def test_header_roundtrips():
    vh = VideoHeader(n_frames=9, intra_pos=(0,), p_pos=(8,))
    data = vh.to_bytes() + b"xyz"
    vh2, rest = VideoHeader.read(data)
    assert rest == b"xyz" and vh2 == vh

    fh = FrameHeader(display_index=4, frame_type="B", frame_data_type="yuv420", bitdepth=10,
                     index_references=(0, 8), global_flow=(-3, 2, 0, -7), warp_filter_size=8)
    fh2, rest = FrameHeader.read(fh.to_bytes() + b"Q")
    assert rest == b"Q" and fh2 == fh

    q = {}
    eg = {}
    from coolchic_tpu.bitstream.headers import MODULE_ORDER, Q_STEP_SHIFTS, WB_ORDER
    for m in MODULE_ORDER:
        for wb in WB_ORDER:
            q[(m, wb)] = Q_STEP_SHIFTS[(m, wb)][0]
            eg[(m, wb)] = 3
    ch = CoolChicHeader(
        img_size=(512, 768),
        layers_synthesis=("48-1-linear-relu", "3-1-linear-none", "3-3-residual-relu"),
        linear_stabiliser_synth=True, ups_k_size=8, ups_preconcat_k_size=7,
        output_feature_ifce=6, spatial_context_arm=24, linear_stabiliser_arm=True,
        n_hidden_layers_arm=2, latent_resolution=(0, 6), n_latent_grids=7,
        flag_common_randomness=False, final_upsampling_type="bicubic",
        ifce_resolution=(0, 2), hyperlatent_resolution=None,
        nn_q_step_shift=q, nn_expgol_cnt=eg,
        nn_n_bytes=1234, nn_n_bit_pad=5, n_bytes_latent=99999,
    )
    ch2, rest = CoolChicHeader.read(ch.to_bytes() + b"#")
    assert rest == b"#" and ch2 == ch
    cfg = ch2.to_config()
    assert cfg.n_latent_grids == 7 and cfg.total_context_arm == 30


def test_grid_codec_roundtrip_with_arm():
    """Full-grid wavefront encode -> decode with a random fixed-point ARM."""
    h, w = 37, 53
    n_ctx, n_ifce = 16, 4
    dim = n_ctx + n_ifce
    n_hidden = 2

    layers = []
    for _ in range(n_hidden):
        layers.append({
            "weight": RNG.integers(-40, 40, (dim, dim)),
            "bias": RNG.integers(-2000, 2000, (dim,)),
        })
    layers.append({
        "weight": RNG.integers(-40, 40, (2, dim)),
        "bias": RNG.integers(-2000, 2000, (2,)),
    })
    stab = {"weight": RNG.integers(-40, 40, (2, dim)), "bias": RNG.integers(-100, 100, (2,))}

    arm_fp = arm_to_fixed_point(layers, -8, -16, stabiliser=stab,
                                subtract_last_layer=True, n_inter_ft_ctx=n_ifce)

    data = np.clip(np.round(RNG.standard_normal((h, w)) * 6), -64, 63).astype(np.int64)
    ifce_ctx = RNG.integers(-(1 << 10), 1 << 10, (h * w, n_ifce)).astype(np.int64)
    ctx_idx = non_zero_pixel_ctx_index(n_ctx)

    enc = rc.RangeEncoder()
    rc.code_grid(enc, True, h, w, n_ctx, ifce_ctx, arm_fp, ctx_idx, data=data)
    payload = enc.get_bytes()

    dec = rc.RangeDecoder(payload)
    out = rc.code_grid(dec, False, h, w, n_ctx, ifce_ctx, arm_fp, ctx_idx)
    np.testing.assert_array_equal(out, data)


def test_grid_codec_narrow_grid():
    """w <= 9 takes the raster-order path."""
    h, w, n_ctx = 11, 6, 8
    layers = [{"weight": RNG.integers(-40, 40, (2, n_ctx)),
               "bias": RNG.integers(-2000, 2000, (2,))}]
    arm_fp = arm_to_fixed_point(layers, -8, -16, stabiliser=None, subtract_last_layer=True)
    data = np.clip(np.round(RNG.standard_normal((h, w)) * 3), -64, 63).astype(np.int64)
    ctx_idx = non_zero_pixel_ctx_index(n_ctx)
    enc = rc.RangeEncoder()
    rc.code_grid(enc, True, h, w, n_ctx, None, arm_fp, ctx_idx, data=data)
    dec = rc.RangeDecoder(enc.get_bytes())
    out = rc.code_grid(dec, False, h, w, n_ctx, None, arm_fp, ctx_idx)
    np.testing.assert_array_equal(out, data)
