"""A/B: pyramidal-LK flow guidance vs NO guidance for inter-frame encoding
(VERDICT r2 item 9 / r4 item 5: quantify the RAFT-substitute's value, and
read the result in RD terms, not raw PSNR/bpp).

Encodes frame 0 (I) of the BQSquare clip once, then frame 1 (P) in both arms
from the same reference: (a) with LK-guided motion pretraining, (b) with
motion pretraining disabled. Same budget everywhere else, optionally
averaged over several seeds. Each arm reports PSNR, bpp AND the RD loss at
the trained lambda (10^(-psnr/10) + lmbda * bpp); the JSON carries an
explicit `verdict` naming the RD-winning arm so the production default
(train/video.py motion pretraining) can be held to it.

Usage: python tools/ab_flow_guidance.py [--n_itr 2000] [--seeds 2] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

VIDEO = os.path.join(HERE, "tests", "data",
                     "D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_itr", type=int, default=2000)
    ap.add_argument("--itr_pretrain", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=1,
                    help="average each arm over this many encoder seeds")
    ap.add_argument("--lmbda", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/ab_flow")
    ap.add_argument("--json_out", default="",
                    help="write the A/B summary JSON here")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.train.presets import TrainerPhase, Warmup, WarmupPhase
    from coolchic_tpu.train.video import encode_one_frame
    from coolchic_tpu.utils.codingstructure import CodingStructure
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        MOTION_OPERATING_POINTS,
        RESIDUE_OPERATING_POINTS,
    )
    from tests.test_e2e_video import FastVideoPreset

    class ABPreset(FastVideoPreset):
        pass

    def preset_for(n_itr, pretrain):
        p = ABPreset(lmbda=args.lmbda, start_lr=1e-2, itr_main_training=50,
                     itr_motion_pretrain=pretrain)
        p.training_phases[0].max_itr = n_itr
        p.training_phases[0].freq_valid = max(n_itr // 8, 10)
        # Production semantics (PresetInter): a 2-candidate warm-up where
        # only the odd candidate takes the pretrained motion, so the
        # tournament ARBITRATES guidance per frame instead of it being
        # forced on (train/video.py:272-281). The round-4 A/B lacked this,
        # which is exactly the configuration where guidance can hurt.
        p.warmup = Warmup([WarmupPhase(candidates=2, training_phase=TrainerPhase(
            lr=1e-2, max_itr=max(n_itr // 10, 50), freq_valid=10**6,
            patience=10**6, schedule_lr=False,
            softround_temperature=(0.3, 0.3), noise_parameter=(2.0, 2.0),
            quantizer_noise_type="kumaraswamy", quantizer_type="softround",
            lmbda=args.lmbda))])
        return p

    os.makedirs(args.out, exist_ok=True)
    base_wd = os.path.join(args.out, "base")
    shutil.rmtree(base_wd, ignore_errors=True)
    os.makedirs(base_wd)
    cs = CodingStructure(n_frames=2, intra_pos=[0], p_pos=[1])
    r0 = encode_one_frame(cs.get_frame_from_coding_order(0), cs, VIDEO, base_wd,
                          preset_for(args.n_itr, 0),
                          {"residue": INTRA_OPERATING_POINTS["lop"]},
                          verbose=False, rdoq=True)
    print(f"I frame: {r0['logs'].psnr_db:.3f} dB "
          f"{8 * len(r0['payload']) / (224 * 128):.4f} bpp", flush=True)

    results = {}
    for arm, pretrain in (("lk_guided", args.itr_pretrain), ("no_guidance", 0)):
        runs = []
        for seed in range(args.seeds):
            wd = os.path.join(args.out, f"{arm}_s{seed}")
            shutil.rmtree(wd, ignore_errors=True)
            shutil.copytree(base_wd, wd)
            r1 = encode_one_frame(cs.get_frame_from_coding_order(1), cs, VIDEO,
                                  wd, preset_for(args.n_itr, pretrain),
                                  {"residue": RESIDUE_OPERATING_POINTS["lop"],
                                   "motion": MOTION_OPERATING_POINTS["lop"]},
                                  seed=seed, verbose=False, rdoq=True)
            bpp = 8 * len(r1["payload"]) / (224 * 128)
            psnr = float(r1["logs"].psnr_db)
            rd = 10.0 ** (-psnr / 10.0) + args.lmbda * bpp
            runs.append({"seed": seed, "psnr_db": round(psnr, 4),
                         "rate_bpp": round(bpp, 5), "rd_loss": rd})
            print(f"P frame [{arm} seed {seed}]: {psnr:.3f} dB {bpp:.4f} bpp "
                  f"rd_loss {rd:.6e}", flush=True)
        results[arm] = {
            "psnr_db": round(sum(r["psnr_db"] for r in runs) / len(runs), 4),
            "rate_bpp": round(sum(r["rate_bpp"] for r in runs) / len(runs), 5),
            "rd_loss": sum(r["rd_loss"] for r in runs) / len(runs),
            "runs": runs}
    better = min(results, key=lambda a: results[a]["rd_loss"])
    margin = abs(results["lk_guided"]["rd_loss"]
                 - results["no_guidance"]["rd_loss"]) / \
        max(results["no_guidance"]["rd_loss"], 1e-12)
    out = {"video": os.path.basename(VIDEO), "lmbda": args.lmbda,
           "n_itr": args.n_itr, "itr_pretrain": args.itr_pretrain,
           "seeds": args.seeds,
           "i_frame": {"psnr_db": round(r0["logs"].psnr_db, 4)},
           "arms": results,
           "verdict": {"rd_better_arm": better,
                       "rd_margin_pct": round(100 * margin, 3)}}
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))
    print(json.dumps(out, default=float))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
