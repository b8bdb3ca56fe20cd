"""End-to-end --tune=wasserstein: common-randomness grids active (extra
synthesis inputs, regenerated deterministically by the decoder), Wasserstein
+ MSE mixed distortion in training, full bitstream round-trip."""

import math
import pytest

import numpy as np

from coolchic_tpu.io.framedata import FrameData
from coolchic_tpu.io.images import read_png
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
from tests.test_e2e import FastPreset

pytestmark = pytest.mark.slow


def test_e2e_wasserstein_cr(tmp_path):
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.train.encode import encode_image_to_bitstream

    full = read_png("tests/data/192x128_kodim15.png")
    frame = FrameData(8, "rgb", np.asarray(full.data)[:, :, :64, :96])
    h, w = frame.img_size
    assert (h, w) == (64, 96)

    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], (h, w), tune="wasserstein")}
    assert cfgs["residue"].flag_common_randomness
    assert cfgs["residue"].input_feature_synthesis == 2 * (
        cfgs["residue"].latent_resolution[1] - cfgs["residue"].latent_resolution[0] + 1)

    preset = FastPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=50,
                        dist_weight={"mse": 0.2, "wasserstein": 0.8 / 200})
    path = str(tmp_path / "wd.cool")
    res = encode_image_to_bitstream(frame, cfgs, preset, path, seed=0, verbose=False,
                                    rdoq=False)

    frames = decode_video(path)
    dec = np.asarray(frames["0"].data)
    mse = float(((dec - np.asarray(frame.data)) ** 2).mean())
    psnr = -10 * math.log10(max(mse, 1e-10))
    # encoder-side logs use the mixed distortion; PSNR agreement still holds
    assert abs(psnr - res["psnr_db"]) < 0.35, (psnr, res["psnr_db"])
    assert psnr > 15.0
