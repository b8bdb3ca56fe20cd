"""`tpu` bitstream profile (docs/tpu_profile.md): parallel-stream latents.

The profile re-partitions each grid's symbols over L interleaved range-coder
streams, keyed by ROW (the pixel at row y -> stream y % L), so decoding
vectorizes over lanes. Probabilities, fixed-point ARM and the integer
probability model are unchanged, so the latents must round-trip exactly.
"""

import os

import numpy as np
import pytest

BITSTREAM = "/root/reference/samples/bitstreams/kodim14.cool"


@pytest.mark.skipif(not os.path.exists(BITSTREAM), reason="reference bitstream unavailable")
def test_tpu_profile_roundtrips_kodim14_latents():
    """Transcode the reference kodim14 latents into the tpu profile and back."""
    from coolchic_tpu.bitstream import codec, rangecoder as rc
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
    from coolchic_tpu.bitstream.nncodec import decode_network

    raw = open(BITSTREAM, "rb").read()
    _, rest = VideoHeader.read(raw)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    nn = decode_network(bytes_nn, cfg, ch.nn_q_step_shift, ch.nn_expgol_cnt,
                        ch.nn_n_bit_pad)

    _, grids_ref = codec.decode_coolchic(ch, bytes_nn, bytes_latent, profile="ref")
    n_bytes_ref = ch.n_bytes_latent

    # Re-encode the same latents with the parallel-stream profile.
    # decode_network keeps ARM/IFCE params integer, so it doubles as the
    # integer-param source for encoding.
    quantized = [np.asarray(g, dtype=np.int64) for g in grids_ref]
    payload = codec.encode_coolchic_latents(ch, nn, quantized, profile="tpu")
    assert ch.n_bytes_latent == len(payload)

    _, grids_tpu = codec.decode_coolchic(ch, bytes_nn, payload, profile="tpu")
    for a, b in zip(grids_ref, grids_tpu):
        np.testing.assert_array_equal(a, b)

    # Sealing overhead: 128 streams on big grids costs ~4B each; the total
    # must stay within a few percent of the single-stream payload.
    overhead = len(payload) - n_bytes_ref
    assert overhead < 8192, (len(payload), n_bytes_ref)


def test_tpu_profile_e2e(tmp_path):
    """Full encode -> CCTP container -> decode_video round-trip."""
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.bitstream.encode import TPU_PROFILE_MAGIC
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )
    from tests.test_e2e import FastPreset

    frame = read_png("tests/data/192x128_kodim15.png")
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], frame.img_size)}
    preset = FastPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=50)

    path_tpu = str(tmp_path / "tpu.cool")
    res = encode_image_to_bitstream(frame, cfgs, preset, path_tpu, seed=0,
                                    verbose=False, rdoq=False, profile="tpu")
    assert open(path_tpu, "rb").read(5) == TPU_PROFILE_MAGIC

    dec = decode_video(path_tpu)["0"]
    d = np.asarray(dec.data) - np.asarray(frame.data)
    mse = float((d * d).mean())
    dec_psnr = -10 * np.log10(max(mse, 1e-10))
    assert abs(dec_psnr - res["psnr_db"]) < 0.3, (dec_psnr, res["psnr_db"])


def test_tpu_profile_batched_image_decode(tmp_path):
    """decode_images: two differently-trained bitstreams decode together
    (per-pyramid-level staging, codec.decode_coolchic_batched) to exactly
    the frames the one-at-a-time decoder produces."""
    from coolchic_tpu.bitstream.decode import decode_images, decode_video
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )
    from tests.test_e2e import FastPreset

    frame = read_png("tests/data/192x128_kodim15.png")
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], frame.img_size)}
    paths = []
    for seed, lmbda in ((0, 1e-3), (1, 2e-2)):
        preset = FastPreset(lmbda=lmbda, start_lr=1e-2, itr_main_training=40)
        path = str(tmp_path / f"im{seed}.cool")
        encode_image_to_bitstream(frame, cfgs, preset, path, seed=seed,
                                  verbose=False, rdoq=False, profile="tpu")
        paths.append(path)

    batched = decode_images(paths)
    for path, got in zip(paths, batched):
        want = decode_video(path)["0"]
        np.testing.assert_array_equal(np.asarray(got.data),
                                      np.asarray(want.data))


def test_wavefront_step_formula():
    """The normative tpu-profile wavefront step (pinned; the C++ and Pallas
    implementations must agree -- the round-trip tests above exercise that)."""
    from coolchic_tpu.ops.pallas_decode import tpu_wavefront_step

    assert tpu_wavefront_step(768) == 6
    assert tpu_wavefront_step(384) == 5
    assert tpu_wavefront_step(128) == 5
    assert tpu_wavefront_step(10) == 5
    assert tpu_wavefront_step(1270) == 10
    assert tpu_wavefront_step(640) == 5
    assert tpu_wavefront_step(641) == 6
