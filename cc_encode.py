#!/usr/bin/env python3
"""Encode one frame of an image or video (reference CLI parity: cc_encode.py).

Examples:
  python cc_encode.py -i img.png -o out.cool --dec_cfg_residue=hop --lmbda 1e-3
  python cc_encode.py -i vid_512x768_yuv420_8b.yuv -o out.cool --coding_idx 1 \
      --intra_pos 0 --p_pos -1 --n_frames 5
"""

import argparse
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=True, help="png / ppm / yuv input")
    p.add_argument("-o", "--output", required=True, help="output .cool bitstream")
    p.add_argument("--workdir", default=None, help="working directory (decoded refs etc.)")
    p.add_argument("--lmbda", type=float, default=1e-3, help="rate constraint lambda")
    p.add_argument("--n_itr", type=int, default=10000, help="main training iterations")
    p.add_argument("--n_itr_pretrain_motion", type=int, default=3000)
    p.add_argument("--start_lr", type=float, default=1e-2)
    p.add_argument("--recipe", default="auto", choices=["auto", "intra", "inter", "debug",
                                                        "measure_speed"])
    p.add_argument("--dec_cfg_residue", default="hop",
                   help="operating point (vlop/lop/mop/hop/vhop) or cfg file")
    p.add_argument("--dec_cfg_motion", default="mop")
    p.add_argument("--n_frames", type=int, default=1)
    p.add_argument("--intra_pos", default="0")
    p.add_argument("--p_pos", default="")
    p.add_argument("--coding_idx", type=int, default=0)
    p.add_argument("--tune", default="mse", choices=["mse", "wasserstein"])
    p.add_argument("--profile", default="ref", choices=["ref", "tpu"],
                   help="bitstream profile: ref = reference bit-compatible, "
                        "tpu = parallel-stream latents (docs/tpu_profile.md)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("-v", "--verbose", action="count", default=1)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from coolchic_tpu.train.presets import AVAILABLE_PRESETS
    from coolchic_tpu.train.video import encode_one_frame
    from coolchic_tpu.utils.codingstructure import CodingStructure
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        MOTION_OPERATING_POINTS,
        RESIDUE_OPERATING_POINTS,
        parse_frame_positions,
    )

    workdir = args.workdir or os.path.join(os.path.dirname(args.output) or ".", "workdir")
    os.makedirs(workdir, exist_ok=True)

    intra_pos = parse_frame_positions(args.intra_pos, args.n_frames)
    p_pos = parse_frame_positions(args.p_pos, args.n_frames)
    cs = CodingStructure(n_frames=args.n_frames, intra_pos=intra_pos, p_pos=p_pos)
    frame = cs.get_frame_from_coding_order(args.coding_idx)
    if frame is None:
        print(f"no frame with coding_idx {args.coding_idx}")
        return 1

    if args.tune == "wasserstein":
        if args.input.endswith(".yuv"):
            print("--tune=wasserstein cannot be used with YUV files; use --tune=mse")
            return 1
        # Empirical weighting ("Perceptually optimised Cool-chic for CLIC 2025").
        dist_weight = {"mse": 0.2, "wasserstein": 0.8 / 200}
    else:
        dist_weight = {"mse": 1.0}

    recipe = args.recipe
    if recipe == "auto":
        recipe = "intra" if frame.frame_type == "I" else "inter"
    preset = AVAILABLE_PRESETS[recipe](
        lmbda=args.lmbda, start_lr=args.start_lr, itr_main_training=args.n_itr,
        itr_motion_pretrain=args.n_itr_pretrain_motion, dist_weight=dist_weight)

    def op_point(table, name):
        if name in table:
            return table[name]
        raise ValueError(f"unknown operating point {name}; available: {list(table)}")

    if frame.frame_type == "I":
        cfg_args = {"residue": op_point(INTRA_OPERATING_POINTS, args.dec_cfg_residue)}
    else:
        cfg_args = {"residue": op_point(RESIDUE_OPERATING_POINTS, args.dec_cfg_residue),
                    "motion": op_point(MOTION_OPERATING_POINTS, args.dec_cfg_motion)}

    res = encode_one_frame(frame, cs, args.input, workdir, preset, cfg_args,
                           seed=args.seed, verbose=args.verbose > 0, tune=args.tune,
                           profile=args.profile)

    mode = "wb" if frame.coding_order == 0 else "ab"
    with open(args.output, mode) as f:
        f.write(res["payload"])
    print(f"wrote {len(res['payload'])} bytes to {args.output} "
          f"(psnr {res['logs'].psnr_db:.3f} dB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
