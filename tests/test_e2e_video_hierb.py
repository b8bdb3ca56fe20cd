"""5-frame hierarchical-B end-to-end bitstream test WITH RDOQ (VERDICT r2
item 6): mirrors the reference sanity-check matrix row
(reference test/sanity_check.py:64-76 -- 5-frame yuv420 video, `--p_pos=-1`),
exercising I + P + two-level hierarchical B (two-reference beta blend),
motion cool-chic RDOQ, and the full bitstream write/decode round trip.

The 5-frame clip is built from the in-repo 3-frame BQSquare cut by mirroring
(frames 0,1,2,1,0) -- real pixels, real motion, both temporal directions.
"""

import math
import os

import numpy as np
import pytest

from coolchic_tpu.utils.codingstructure import CodingStructure
from coolchic_tpu.utils.parsecli import (
    INTRA_OPERATING_POINTS,
    MOTION_OPERATING_POINTS,
    RESIDUE_OPERATING_POINTS,
)
from tests.test_e2e_video import VIDEO, FastVideoPreset

pytestmark = pytest.mark.slow

FRAME_BYTES = 224 * 128 * 3 // 2  # yuv420 8b


def _make_5frame_clip(tmp_path) -> str:
    raw = open(VIDEO, "rb").read()
    assert len(raw) == 3 * FRAME_BYTES
    frames = [raw[i * FRAME_BYTES:(i + 1) * FRAME_BYTES] for i in range(3)]
    out = str(tmp_path / "D-BQSquare-5frames_224x128_60p_yuv420_8b.yuv")
    with open(out, "wb") as f:
        for i in (0, 1, 2, 1, 0):
            f.write(frames[i])
    return out


def test_e2e_video_hierarchical_b_rdoq(tmp_path):
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.train.video import encode_one_frame

    video = _make_5frame_clip(tmp_path)
    workdir = str(tmp_path / "work")
    os.makedirs(workdir, exist_ok=True)

    # --p_pos=-1 resolves to the last frame via the position DSL; hierarchical
    # B frames auto-fill in between (reference utils/codingstructure.py:
    # 267-436 semantics).
    from coolchic_tpu.utils.parsecli import parse_frame_positions

    cs = CodingStructure(n_frames=5, intra_pos=[0],
                         p_pos=parse_frame_positions("-1", 5))
    ftypes = {f.display_order: f.frame_type
              for f in (cs.get_frame_from_coding_order(i) for i in range(5))}
    assert ftypes == {0: "I", 4: "P", 2: "B", 1: "B", 3: "B"}

    results = []
    for ci in range(5):
        frame = cs.get_frame_from_coding_order(ci)
        if frame.frame_type == "I":
            cfgs = {"residue": INTRA_OPERATING_POINTS["lop"]}
            preset = FastVideoPreset(lmbda=1e-3, start_lr=1e-2,
                                     itr_main_training=50)
        else:
            cfgs = {"residue": RESIDUE_OPERATING_POINTS["lop"],
                    "motion": MOTION_OPERATING_POINTS["lop"]}
            preset = FastVideoPreset(lmbda=1e-3, start_lr=1e-2,
                                     itr_main_training=50,
                                     itr_motion_pretrain=20)
        # rdoq=True: RDOQ refines BOTH cool-chics (residue + motion), matching
        # the reference's inter-frame rdoq coverage (reference nnquant/
        # rdoq.py:347-462 refines motion synthesis too).
        results.append(encode_one_frame(frame, cs, video, workdir, preset,
                                        cfgs, verbose=False, rdoq=True))

    path = str(tmp_path / "vid.cool")
    with open(path, "wb") as f:
        for r in results:
            f.write(r["payload"])

    frames = decode_video(path)
    assert sorted(frames.keys()) == [str(i) for i in range(5)]
    by_display = {}
    for ci, r in enumerate(results):
        by_display[cs.get_frame_from_coding_order(ci).display_order] = r

    for i in range(5):
        orig = load_frame_data_from_file(video, i)
        dec = frames[str(i)]
        num, den = 0.0, 0
        for k in ("y", "u", "v"):
            d = np.asarray(dec.data[k]) - np.asarray(orig.data[k])
            num += float((d * d).sum())
            den += d.size
        psnr = -10 * math.log10(num / den)
        # reference sanity-check tolerance: encoder estimate vs decoder
        # measurement within 0.3 dB (test/sanity_check.py:142-158)
        assert abs(psnr - by_display[i]["logs"].psnr_db) < 0.3, \
            (i, psnr, by_display[i]["logs"].psnr_db)
        assert psnr > 20.0
