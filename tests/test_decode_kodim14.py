"""Golden regression: decode the reference-encoded kodim14.cool bitstream.

Decoding a bitstream produced by the reference implementation (via the
constriction Rust range coder) is the strongest available bit-compatibility
check: one wrong bit anywhere in the range decoder, quantized-Laplace model,
fixed-point ARM/IFCE, wavefront order or exp-Golomb NN codec and the latent
planes decode to noise.
"""

import os

import numpy as np
import pytest

BITSTREAM = "/root/reference/samples/bitstreams/kodim14.cool"

# Golden statistics of the decoded latent planes (verified once against a
# visually-correct full decode; any entropy-decoding drift breaks these).
GOLDEN_GRID_SUMS = [-46923, -3862, -3667, -53, -16, 147, -242, -75, 47, 110]
GOLDEN_GRID_ABS_SUMS = [112383, 103372, 23271, 6891, 2124, 1053, 528, 337, 167, 112]


@pytest.mark.skipif(not os.path.exists(BITSTREAM), reason="reference bitstream unavailable")
def test_kodim14_latents_decode_exactly():
    from coolchic_tpu.bitstream import codec, rangecoder as rc
    from coolchic_tpu.bitstream.fixedpoint import arm_to_fixed_point
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
    from coolchic_tpu.bitstream.nncodec import decode_network
    from coolchic_tpu.core.constants import non_zero_pixel_ctx_index

    raw = open(BITSTREAM, "rb").read()
    vh, rest = VideoHeader.read(raw)
    assert vh.n_frames == 1 and vh.intra_pos == (0,)
    fh, rest = FrameHeader.read(rest)
    assert (fh.frame_type, fh.frame_data_type, fh.bitdepth) == ("I", "rgb", 8)
    ch, rest = CoolChicHeader.read(rest)
    assert ch.img_size == (512, 768) and ch.n_latent_grids == 10
    assert ch.nn_n_bytes + ch.n_bytes_latent == len(rest)

    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    nn = decode_network(bytes_nn, cfg, ch.nn_q_step_shift, ch.nn_expgol_cnt, ch.nn_n_bit_pad)

    # The identity output transform must decode to an exact eye matrix.
    ot = nn["synthesis"]["output_transform"]["weight"].reshape(3, 3)
    np.testing.assert_array_equal(ot, np.eye(3, dtype=np.float32))

    arm_fp = arm_to_fixed_point(
        nn["arm"]["layers"], ch.nn_q_step_shift[("arm", "weight")],
        ch.nn_q_step_shift[("arm", "bias")], stabiliser=nn["arm"].get("stabiliser"),
        subtract_last_layer=True, n_inter_ft_ctx=cfg.output_feature_ifce)
    ctx_idx = non_zero_pixel_ctx_index(cfg.spatial_context_arm)

    decoder = rc.RangeDecoder(bytes_latent)
    decoded = []
    for idx in range(cfg.n_latent_grids - 1, -1, -1):
        h_i, w_i = cfg.size_per_latent[idx]
        ifce_ctx = codec._ifce_context_for_grid(nn, cfg, ch, idx, decoded, h_i, w_i)
        grid = rc.code_grid(decoder, False, h_i, w_i, cfg.spatial_context_arm,
                            ifce_ctx, arm_fp, ctx_idx)
        decoded.insert(0, grid)

    sums = [int(g.sum()) for g in decoded]
    abs_sums = [int(np.abs(g).sum()) for g in decoded]
    assert sums == GOLDEN_GRID_SUMS, sums
    assert abs_sums == GOLDEN_GRID_ABS_SUMS, abs_sums
