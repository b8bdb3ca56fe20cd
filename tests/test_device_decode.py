"""Fully on-device batched decoder vs the host-orchestrated decode path.

device_decode runs the whole tpu-profile decode (Pallas wavefront kernels,
on-device int32 IFCE context, shear/de-shear, float tail) as one jitted
program; it must reproduce the host path's integer grids EXACTLY and the
float output to f32 round-off. Exercised in interpret mode on a small image
whose grids are forced to 128 streams (the kernel-eligible layout).
"""

import numpy as np
import pytest

from coolchic_tpu.bitstream import codec
from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader


@pytest.fixture(scope="module")
def tpu_items(tmp_path_factory):
    """Two small tpu-profile encodes with 128-stream grids forced down to
    384-pixel grids (so the Pallas-eligible path covers levels 0..2)."""
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )
    from tests.test_e2e import FastPreset

    orig = codec.grid_n_streams
    codec.grid_n_streams = lambda h, w: 128 if h * w >= 384 else orig(h, w)
    tmp_path = tmp_path_factory.mktemp("devdec")
    try:
        frame = read_png("tests/data/192x128_kodim15.png")
        crop = np.asarray(frame.data)[:, :, :64, :96]
        from coolchic_tpu.io.framedata import FrameData

        small = FrameData(bitdepth=8, frame_data_type="rgb", data=crop)
        cfgs = {"residue": coolchic_config_from_args(
            INTRA_OPERATING_POINTS["lop"], small.img_size)}
        items = []
        for seed, lmbda in ((0, 1e-3), (1, 4e-3)):
            preset = FastPreset(lmbda=lmbda, start_lr=1e-2, itr_main_training=30)
            path = str(tmp_path / f"im{seed}.cool")
            encode_image_to_bitstream(small, cfgs, preset, path, seed=seed,
                                      verbose=False, rdoq=False, profile="tpu")
            raw = open(path, "rb").read()
            from coolchic_tpu.bitstream.encode import TPU_PROFILE_MAGIC

            assert raw.startswith(TPU_PROFILE_MAGIC)
            rest = raw[len(TPU_PROFILE_MAGIC):]
            _, rest = VideoHeader.read(rest)
            _, rest = FrameHeader.read(rest)
            ch, rest = CoolChicHeader.read(rest)
            bytes_nn = rest[:ch.nn_n_bytes]
            bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
            items.append((ch, bytes_nn, bytes_latent))
    finally:
        codec.grid_n_streams = orig
    return items


def test_device_decode_matches_host(tpu_items):
    from coolchic_tpu.bitstream.device_decode import (
        decode_images_device,
        prepare_batch,
    )

    batch = prepare_batch(tpu_items, interpret=True)
    # the forced 128-stream layout must actually engage the kernel path
    assert len(batch.device_levels) >= 2, batch.device_levels

    device = decode_images_device(tpu_items)
    for item, (raw_dev, grids_dev) in zip(tpu_items, device):
        raw_host, grids_host = codec.decode_coolchic(*item, profile="tpu")
        for a, b in zip(grids_host, grids_dev):
            np.testing.assert_array_equal(a, b)
        # float tail: identical math modulo vmap batching; allow f32 noise
        np.testing.assert_allclose(raw_dev, raw_host, atol=2e-5)


def test_device_decode_shear_maps_roundtrip():
    """Shear followed by de-shear is the identity on every pixel."""
    from coolchic_tpu.bitstream.device_decode import _shear_maps

    for h, w in ((64, 96), (33, 47), (128, 256)):
        src, deshear, D, PAD_D = _shear_maps(h, w)
        # scatter pixel ids through the shear map, then read back
        flat = np.full((D * 128,), -1, np.int64)
        vals = np.arange(h * w + 1)
        vals[-1] = -1
        flat = vals[src]
        padded = np.full(((D + PAD_D + 5) * 128,), -1, np.int64)
        padded[PAD_D * 128:(PAD_D + D) * 128] = flat
        got = padded[deshear]
        np.testing.assert_array_equal(got, np.arange(h * w))
