"""Wide-grid (w > 1270) on-device decode (VERDICT r2 item 7 / BASELINE
config #4, 2K-class stills): the round-2 Pallas routing capped kernel
eligibility at w <= 1270; the real constraint is VMEM fit, which admits
2K-class level-0 grids. Pin the kernel path on a 128x1408 image (level 0
w = 1408 > 1270, step = ceil(1408/128) = 11) bit-exactly against the host
C++ decode, end-to-end through a real tpu-profile bitstream."""

import numpy as np
import pytest

from coolchic_tpu.bitstream import codec
from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader

pytestmark = pytest.mark.slow


def test_wide_grid_kernel_eligibility():
    from coolchic_tpu.ops.pallas_decode import grid_batch_limit, kernel_eligible

    # 2K-class level-0 grids are now kernel-eligible...
    assert kernel_eligible(1365, 2048, 6)
    assert kernel_eligible(1024, 1888, 6)
    assert kernel_eligible(128, 1408, 6)
    # ...at a VMEM-derived grid batch
    assert grid_batch_limit(1365, 2048, 6, ifce_packed=True) >= 1
    assert grid_batch_limit(512, 768, 6, ifce_packed=True) >= 8
    # absurd sizes stay on the host path
    assert not kernel_eligible(8192, 8192, 6)


def test_wide_grid_device_decode_bit_exact(tmp_path):
    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )
    from tests.test_e2e import FastPreset

    # 128x1408 wide strip: tile the (H=128, W=192) test image sideways (real
    # pixel statistics; w=1408 exceeds the old 1270 cap -> 128 streams)
    base = np.asarray(read_png("tests/data/192x128_kodim15.png").data)
    strip = np.concatenate([base] * 8, axis=3)[:, :, :, :1408]
    frame = FrameData(bitdepth=8, frame_data_type="rgb",
                      data=np.ascontiguousarray(strip))
    assert frame.img_size == (128, 1408)

    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], frame.img_size)}
    preset = FastPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=20)
    path = str(tmp_path / "wide.cool")
    encode_image_to_bitstream(frame, cfgs, preset, path, seed=0,
                              verbose=False, rdoq=False, profile="tpu")

    from coolchic_tpu.bitstream.encode import TPU_PROFILE_MAGIC

    raw = open(path, "rb").read()
    assert raw.startswith(TPU_PROFILE_MAGIC)
    rest = raw[len(TPU_PROFILE_MAGIC):]
    _, rest = VideoHeader.read(rest)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    item = (ch, bytes_nn, bytes_latent)

    from coolchic_tpu.bitstream.device_decode import (
        decode_images_device,
        prepare_batch,
    )

    batch = prepare_batch([item], interpret=True)
    # the wide level-0 grid itself must take the kernel path
    assert 0 in batch.device_levels, batch.device_levels

    (raw_dev, grids_dev), = decode_images_device([item])
    raw_host, grids_host = codec.decode_coolchic(*item, profile="tpu")
    for a, b in zip(grids_host, grids_dev):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(raw_dev, raw_host, atol=2e-5)
