"""End-to-end inter-frame coding: encode I + P from a real yuv420 clip with a
tiny schedule, write one bitstream, decode both frames back and require
encoder/decoder agreement (the video half of the reference sanity check)."""

import math
import pytest
import os

import numpy as np

from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup, WarmupPhase
from coolchic_tpu.utils.codingstructure import CodingStructure
from coolchic_tpu.utils.parsecli import (
    INTRA_OPERATING_POINTS,
    MOTION_OPERATING_POINTS,
    RESIDUE_OPERATING_POINTS,
)

pytestmark = pytest.mark.slow

VIDEO = "tests/data/D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv"


class FastVideoPreset(Preset):
    def __post_init__(self):
        self.preset_name = "ci-video"
        self.training_phases = [
            TrainerPhase(lr=self.start_lr, max_itr=40, freq_valid=20, patience=10000,
                         schedule_lr=True, quantizer_type="softround",
                         quantizer_noise_type="gaussian",
                         softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
                         lmbda=self.lmbda),
            TrainerPhase(lr=1e-4, max_itr=10, freq_valid=10, quantizer_type="hardround",
                         quantizer_noise_type="none", lmbda=self.lmbda),
        ]
        self.warmup = Warmup([])
        if self.itr_motion_pretrain > 0:
            self.motion_pretrain_phase = [
                TrainerPhase(lr=1e-2, max_itr=self.itr_motion_pretrain,
                             freq_valid=self.itr_motion_pretrain,
                             patience=10**6, quantizer_type="softround",
                             quantizer_noise_type="kumaraswamy",
                             softround_temperature=(0.3, 0.3),
                             noise_parameter=(2.0, 2.0), lmbda=20 * self.lmbda),
            ]


def test_e2e_video_i_p(tmp_path):
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.train.video import encode_one_frame

    workdir = str(tmp_path / "work")
    os.makedirs(workdir, exist_ok=True)
    cs = CodingStructure(n_frames=2, intra_pos=[0], p_pos=[1])

    preset_i = FastVideoPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=50)
    r0 = encode_one_frame(cs.get_frame_from_coding_order(0), cs, VIDEO, workdir,
                          preset_i, {"residue": INTRA_OPERATING_POINTS["lop"]},
                          verbose=False, rdoq=False)

    preset_p = FastVideoPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=50,
                               itr_motion_pretrain=20)
    r1 = encode_one_frame(cs.get_frame_from_coding_order(1), cs, VIDEO, workdir,
                          preset_p,
                          {"residue": RESIDUE_OPERATING_POINTS["lop"],
                           "motion": MOTION_OPERATING_POINTS["lop"]},
                          verbose=False, rdoq=False)

    path = str(tmp_path / "vid.cool")
    with open(path, "wb") as f:
        f.write(r0["payload"] + r1["payload"])

    frames = decode_video(path)
    enc = {0: r0, 1: r1}
    for i in (0, 1):
        orig = load_frame_data_from_file(VIDEO, i)
        dec = frames[str(i)]
        num, den = 0.0, 0
        for k in ("y", "u", "v"):
            d = np.asarray(dec.data[k]) - np.asarray(orig.data[k])
            num += float((d * d).sum())
            den += d.size
        psnr = -10 * math.log10(num / den)
        assert abs(psnr - enc[i]["logs"].psnr_db) < 0.3, (i, psnr, enc[i]["logs"].psnr_db)
        assert psnr > 20.0
