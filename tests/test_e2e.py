"""End-to-end sanity checks (the reference's test/sanity_check.py matrix,
scaled down for CI): encode a tiny image with a fast schedule, write a real
bitstream, decode it back, and require encoder-side and decoder-side results
to agree (PSNR within 0.3 dB, rate within 20% -- same bars as the
reference)."""

import math

import numpy as np
import pytest

from coolchic_tpu.io.images import read_png
from coolchic_tpu.io.io import load_frame_data_from_file
from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup, WarmupPhase
from coolchic_tpu.utils.parsecli import (
    INTRA_OPERATING_POINTS,
    coolchic_config_from_args,
)

pytestmark = pytest.mark.slow

DATA = "tests/data"


class FastPreset(Preset):
    """Tiny schedule for CI: 1 candidate, 40 + 10 iterations."""

    def __post_init__(self):
        self.preset_name = "ci"
        self.training_phases = [
            TrainerPhase(lr=self.start_lr, max_itr=40, freq_valid=20, patience=10000,
                         schedule_lr=True, quantizer_type="softround",
                         quantizer_noise_type="gaussian",
                         softround_temperature=(0.35, 0.08), noise_parameter=(0.22, 0.15),
                         lmbda=self.lmbda, dist_weight=self.dist_weight),
            TrainerPhase(lr=1e-4, max_itr=10, freq_valid=10, quantizer_type="hardround",
                         quantizer_noise_type="none", lmbda=self.lmbda,
                         dist_weight=self.dist_weight),
        ]
        self.warmup = Warmup([])


def _roundtrip(frame, op_point: str, lmbda: float = 1e-3, tmp_path=None):
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.train.encode import encode_image_to_bitstream

    h, w = frame.img_size
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS[op_point], (h, w))}
    preset = FastPreset(lmbda=lmbda, start_lr=1e-2, itr_main_training=50)
    path = str(tmp_path / "test.cool")
    res = encode_image_to_bitstream(frame, cfgs, preset, path, seed=0, verbose=False,
                                    rdoq=False)

    frames = decode_video(path)
    dec = frames["0"]
    assert dec.frame_data_type == frame.frame_data_type
    assert dec.bitdepth == frame.bitdepth

    if frame.frame_data_type == "yuv420":
        num = 0.0
        den = 0
        for k in ("y", "u", "v"):
            d = np.asarray(dec.data[k]) - np.asarray(frame.data[k])
            num += float((d * d).sum())
            den += d.size
        mse = num / den
    else:
        d = np.asarray(dec.data) - np.asarray(frame.data)
        mse = float((d * d).mean())
    dec_psnr = -10 * math.log10(max(mse, 1e-10))

    # encoder-side estimate vs decoder-side measurement
    assert abs(dec_psnr - res["psnr_db"]) < 0.3, (dec_psnr, res["psnr_db"])
    # real rate (whole file incl. headers) vs encoder rate proxy
    est = res["latent_rate_bpp"]
    real = res["rate_bpp"]
    assert real < est * 1.2 + 0.2, (real, est)
    return res, dec_psnr


def test_e2e_rgb_png(tmp_path):
    frame = read_png(f"{DATA}/192x128_kodim15.png")
    res, dec_psnr = _roundtrip(frame, "lop", tmp_path=tmp_path)
    assert dec_psnr > 20.0  # trained for only 50 iters, but must be an image


def test_e2e_yuv420_8b(tmp_path):
    frame = load_frame_data_from_file(f"{DATA}/kodim15_192x128_01p_yuv420_8b.yuv")
    assert frame.frame_data_type == "yuv420" and frame.bitdepth == 8
    res, dec_psnr = _roundtrip(frame, "lop", tmp_path=tmp_path)
    assert dec_psnr > 20.0


def test_e2e_yuv444_10b(tmp_path):
    frame = load_frame_data_from_file(f"{DATA}/kodim15_192x128_01p_yuv444_10b.yuv")
    assert frame.frame_data_type == "yuv444" and frame.bitdepth == 10
    res, dec_psnr = _roundtrip(frame, "lop", tmp_path=tmp_path)
    assert dec_psnr > 20.0


def test_e2e_yuv420_10b(tmp_path):
    frame = load_frame_data_from_file(f"{DATA}/kodim15_192x128_01p_yuv420_10b.yuv")
    assert frame.frame_data_type == "yuv420" and frame.bitdepth == 10
    res, dec_psnr = _roundtrip(frame, "lop", tmp_path=tmp_path)
    assert dec_psnr > 20.0


def test_e2e_yuv444_8b(tmp_path):
    frame = load_frame_data_from_file(f"{DATA}/kodim15_192x128_01p_yuv444_8b.yuv")
    assert frame.frame_data_type == "yuv444" and frame.bitdepth == 8
    res, dec_psnr = _roundtrip(frame, "lop", tmp_path=tmp_path)
    assert dec_psnr > 20.0
