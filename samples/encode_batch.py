#!/usr/bin/env python3
"""Batch-encode a set of same-sized images as ONE batched TPU program.

This is the dataset-sweep driver behind BD-rate tables (the reference runs
one subprocess per image, samples/encode.py:147-183; here the whole batch is
a single jitted program, sharded over the device mesh when more than one
chip is available).

Example:
  python samples/encode_batch.py --inputs 'kodak/*.png' --out_dir out \
      --lmbda 1e-3 --n_itr 10000 --dec_cfg_residue hop
Writes out/<name>.cool per image plus a results TSV in the reference
results/v5.0 schema (lmbda seq_name n_pixels loss psnr_db rate_bpp).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", required=True, help="glob of same-sized png/ppm images")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--lmbda", type=float, default=1e-3)
    p.add_argument("--n_itr", type=int, default=10000)
    p.add_argument("--start_lr", type=float, default=1e-2)
    p.add_argument("--recipe", default="intra", choices=["intra", "debug"])
    p.add_argument("--dec_cfg_residue", default="hop")
    p.add_argument("--profile", default="ref", choices=["ref", "tpu"])
    p.add_argument("--results", default=None, help="results TSV path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.parallel.batch import make_mesh
    from coolchic_tpu.parallel.encode_batch import encode_images_batched
    from coolchic_tpu.train.presets import AVAILABLE_PRESETS
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )

    paths = sorted(glob.glob(args.inputs))
    if not paths:
        print(f"no inputs match {args.inputs}")
        return 1
    frames = [load_frame_data_from_file(p_) for p_ in paths]
    names = [os.path.splitext(os.path.basename(p_))[0] for p_ in paths]
    os.makedirs(args.out_dir, exist_ok=True)
    out_paths = [os.path.join(args.out_dir, n + ".cool") for n in names]

    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS[args.dec_cfg_residue], frames[0].img_size)}
    preset = AVAILABLE_PRESETS[args.recipe](
        lmbda=args.lmbda, start_lr=args.start_lr, itr_main_training=args.n_itr)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 and len(frames) % n_dev == 0 else None
    if mesh is not None:
        print(f"sharding {len(frames)} images over {n_dev} devices")

    results = encode_images_batched(frames, cfgs, preset, out_paths,
                                    mesh=mesh, seed=args.seed, profile=args.profile)

    results_path = args.results or os.path.join(args.out_dir, "results.tsv")
    with open(results_path, "w") as f:
        f.write("lmbda\tseq_name\tn_pixels\tloss\tpsnr_db\trate_bpp\n")
        for name, r in zip(names, results):
            f.write(f"{args.lmbda}\t{name}\t{r['n_pixels']}\t{r['loss'] * 1e3:.6f}\t"
                    f"{r['psnr_db']:.6f}\t{r['rate_bpp']:.6f}\n")
    print(f"wrote {results_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
