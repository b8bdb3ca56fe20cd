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


# Pixel-level golden produced by the REFERENCE torch decoder
# (/root/reference/cc_decode.py under tools/ref_shims — our C++ range coder
# standing in for constriction, everything downstream pure reference torch;
# see tools/ref_shims/README.md). sha256 of the HxWx3 uint8 array.
GOLDEN_IMAGE_SHA256 = "a8668633477a28faa5cdac2bdf9dc6c1f79ba898f2f4d9332d6609ae970898ef"
GOLDEN_IMAGE = os.path.join(os.path.dirname(__file__), "data", "kodim14_ref_decode.png")

# The int entropy path is exact (test above); the float tail (learned
# upsampling, synthesis convs, bicubic rescale) accumulates ~1-ulp drift vs
# torch's reduction order, which surfaces only at final-rounding ties.
# Measured on 2026-08-19: 8 pixels of 393,216 differ, each by exactly 1 level.
MAX_LEVEL_DIFF = 1
MAX_DIFF_PIXELS = 32  # headroom over the measured 8 for platform variation


@pytest.mark.skipif(not os.path.exists(BITSTREAM), reason="reference bitstream unavailable")
def test_kodim14_image_matches_reference_decoder():
    from PIL import Image

    from coolchic_tpu.bitstream.decode import decode_frame
    from coolchic_tpu.bitstream.headers import VideoHeader

    golden = np.array(Image.open(GOLDEN_IMAGE))
    import hashlib
    assert hashlib.sha256(golden.tobytes()).hexdigest() == GOLDEN_IMAGE_SHA256

    raw = open(BITSTREAM, "rb").read()
    _, rest = VideoHeader.read(raw)
    frame, _ = decode_frame(rest)
    img = np.asarray(frame.data)  # [1, 3, H, W] float in [0, 1]
    ours = np.round(np.clip(img[0], 0.0, 1.0) * 255.0).astype(np.uint8)
    ours = np.transpose(ours, (1, 2, 0))

    assert ours.shape == golden.shape
    diff = ours.astype(np.int32) - golden.astype(np.int32)
    n_diff = int((diff != 0).sum())
    assert int(np.abs(diff).max(initial=0)) <= MAX_LEVEL_DIFF, np.abs(diff).max()
    assert n_diff <= MAX_DIFF_PIXELS, n_diff
