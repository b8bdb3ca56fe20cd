"""Wave-parallel GOP encoding end-to-end (VERDICT r3 item 2).

A 5-frame hierarchical GOP's widest level (B1, B3) is encoded as ONE
batched training program via encode_wave_group — frames are batch slots,
each with its own decoded references riding the batch axis — and the
resulting bitstream must decode with the same encoder/decoder agreement
bars as the serial path, at comparable RD. Replaces the reference's
one-slurm-job-per-frame afterok DAG (reference samples/encode.py:147-183).
"""

import math
import os

import numpy as np
import pytest

from coolchic_tpu.utils.codingstructure import CodingStructure
from coolchic_tpu.utils.parsecli import (
    MOTION_OPERATING_POINTS,
    RESIDUE_OPERATING_POINTS,
    INTRA_OPERATING_POINTS,
    parse_frame_positions,
)
from tests.test_e2e_video import FastVideoPreset
from tests.test_e2e_video_hierb import _make_5frame_clip

pytestmark = pytest.mark.slow


def _psnr_yuv(dec, orig) -> float:
    num, den = 0.0, 0
    for k in ("y", "u", "v"):
        d = np.asarray(dec.data[k]) - np.asarray(orig.data[k])
        num += float((d * d).sum())
        den += d.size
    return -10 * math.log10(num / den)


def test_wave_group_batched_matches_serial(tmp_path):
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.parallel.gop import gop_waves
    from coolchic_tpu.train.video import encode_one_frame, encode_wave_group

    video = _make_5frame_clip(tmp_path)
    workdir = str(tmp_path / "wave")
    os.makedirs(workdir, exist_ok=True)
    cs = CodingStructure(n_frames=5, intra_pos=[0],
                         p_pos=parse_frame_positions("-1", 5))
    waves = gop_waves(cs)
    assert [len(w) for w in waves] == [1, 1, 1, 2]  # I / P / B2 / (B1, B3)

    inter_cfgs = {"residue": RESIDUE_OPERATING_POINTS["lop"],
                  "motion": MOTION_OPERATING_POINTS["lop"]}

    # FastVideoPreset hardcodes a 40+10 schedule; push the main phase to a
    # budget where optimizer noise between the batched window and train()
    # shrinks below the equivalence bar (at 40 iters the scatter is ~0.4 dB)
    N_ITR = 150

    def _mk(**kw):
        p = FastVideoPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=N_ITR,
                            **kw)
        p.training_phases[0].max_itr = N_ITR
        p.training_phases[0].freq_valid = 50
        return p

    results = {}
    for wave in waves:
        for frame in wave:
            assert frame.frame_type == wave[0].frame_type
        if wave[0].frame_type == "I":
            preset = _mk()
            cfgs = {"residue": INTRA_OPERATING_POINTS["lop"]}
        else:
            preset = _mk(itr_motion_pretrain=20)
            cfgs = inter_cfgs
        res_list = encode_wave_group(wave, cs, video, workdir, preset, cfgs,
                                     verbose=False, rdoq=False)
        for frame, res in zip(wave, res_list):
            results[frame.display_order] = res

    # One bitstream in coding order; full decode round-trip.
    path = str(tmp_path / "vid.cool")
    order = sorted(range(5),
                   key=lambda d: cs.get_frame_from_display_order(d).coding_order)
    with open(path, "wb") as f:
        for d in order:
            f.write(results[d]["payload"])
    frames = decode_video(path)
    assert sorted(frames.keys()) == [str(i) for i in range(5)]
    for i in range(5):
        orig = load_frame_data_from_file(video, i)
        psnr = _psnr_yuv(frames[str(i)], orig)
        assert abs(psnr - results[i]["logs"].psnr_db) < 0.3, \
            (i, psnr, results[i]["logs"].psnr_db)
        assert psnr > 20.0

    # The widest wave (B1, B3) against the SERIAL per-frame path with the
    # same preset/seed: comparable RD (batched window vs train() differ in
    # patience/seeding details, so the bar is closeness, not equality).
    serial_dir = str(tmp_path / "serial")
    os.makedirs(serial_dir, exist_ok=True)
    import shutil

    for d in (0, 2, 4):  # reuse the already-decoded references
        for fn in os.listdir(workdir):
            if fn.startswith(f"{d:04d}-decoded"):
                shutil.copy(os.path.join(workdir, fn), serial_dir)
    preset = _mk(itr_motion_pretrain=20)
    dps, wave_mse, serial_mse, wave_bytes, serial_bytes = [], 0.0, 0.0, 0, 0
    for d in (1, 3):
        frame = cs.get_frame_from_display_order(d)
        r = encode_one_frame(frame, cs, video, serial_dir, preset, inter_cfgs,
                             verbose=False, rdoq=False)
        dp = results[d]["logs"].psnr_db - r["logs"].psnr_db
        rr = results[d]["n_bytes"] / max(r["n_bytes"], 1)
        print(f"wave-vs-serial frame {d}: dPSNR {dp:+.3f} dB, "
              f"bytes ratio {rr:.3f}", flush=True)
        dps.append(dp)
        wave_mse += 10 ** (-results[d]["logs"].psnr_db / 10)
        serial_mse += 10 ** (-r["logs"].psnr_db / 10)
        wave_bytes += results[d]["n_bytes"]
        serial_bytes += r["n_bytes"]
        # RD equivalence, not mere closeness (VERDICT r4 item 3): per-frame
        # residual divergence is optimizer noise (different key streams),
        # bounded at this budget; the WAVE-level pooled check below holds
        # the feature's actual claim to +-0.3 dB / +-15% bytes.
        assert abs(dp) < 0.5, (d, dp)
        assert 0.85 < rr < 1.15, (d, rr)
    dp_pool = (-10 * math.log10(wave_mse / 2)) - (-10 * math.log10(serial_mse / 2))
    rr_pool = wave_bytes / serial_bytes
    print(f"wave-vs-serial POOLED: dPSNR {dp_pool:+.3f} dB, "
          f"bytes ratio {rr_pool:.3f}", flush=True)
    assert abs(dp_pool) < 0.3, dp_pool
    assert 0.85 < rr_pool < 1.15, rr_pool
