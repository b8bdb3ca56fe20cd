#!/usr/bin/env python3
"""Batched RD sweep: N images x M lambda points as chunked one-program
batch encodes on one chip, with full NN quantization + RDOQ + decode-back
verification per bitstream. Writes a reference-schema TSV
(lmbda seq_name n_pixels loss psnr_db rate_bpp) plus a BENCH-style JSON
with the measured full-encode throughput (img/s/chip INCLUDING warm-up,
quantization, RDOQ and the bitstream write).

The reference runs this sweep as one cc_encode.py subprocess per
(image, lambda) pair chained through slurm (samples/encode.py:147-183);
here every chunk of images trains as a single jitted program
(parallel/encode_batch.encode_images_batched).

Image set: in this zero-egress environment no pristine Kodak originals
exist, so --kodim14-set derives 24 distinct 512x768 targets from the
decoded kodim14.cool (8 dihedral transforms x 3 channel rotations) -- a
RECOMPRESSION throughput/RD demonstration, not a Kodak reproduction (the
TSV says so in seq_name).

Usage:
  python samples/encode_sweep.py --kodim14-set --out results/round2 \
      --lmbdas 1e-3 4e-3 --n-itr 3000 --chunk 4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kodim14_set(n: int) -> list:
    """n distinct 512x768 recompression targets from kodim14.cool."""
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.framedata import FrameData

    os.environ.setdefault("COOLCHIC_DEVICE_DECODE", "0")
    frame = decode_video("/root/reference/samples/bitstreams/kodim14.cool")["0"]
    base = np.asarray(frame.data)  # [1, 3, 512, 768]
    out = []
    for i in range(n):
        x = base
        if (i // 1) % 2:
            x = x[:, :, :, ::-1]
        if (i // 2) % 2:
            x = x[:, :, ::-1, :]
        if (i // 4) % 2:
            x = 1.0 - x
        x = np.roll(x, shift=i // 8, axis=1)  # channel rotation
        out.append(FrameData(bitdepth=8, frame_data_type="rgb",
                             data=np.ascontiguousarray(x)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kodim14-set", action="store_true")
    ap.add_argument("--n-images", type=int, default=24)
    ap.add_argument("--lmbdas", type=float, nargs="+",
                    default=[1e-4, 4e-4, 1e-3, 4e-3, 2e-2])
    ap.add_argument("--n-itr", type=int, default=3000)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--op", default="hop")
    ap.add_argument("--out", default="results/round2")
    ap.add_argument("--profile", default="tpu")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.parallel.encode_batch import encode_images_batched
    from coolchic_tpu.train.presets import PresetIntra
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )

    assert args.kodim14_set, "only --kodim14-set targets exist in this env"
    frames = kodim14_set(args.n_images)
    os.makedirs(args.out, exist_ok=True)

    h, w = frames[0].img_size
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS[args.op], (h, w))}

    rows = []
    t_all = time.time()
    n_done = 0
    for lmbda in args.lmbdas:
        preset = PresetIntra(lmbda=lmbda, start_lr=1e-2,
                             itr_main_training=args.n_itr)
        for c0 in range(0, len(frames), args.chunk):
            chunk = frames[c0:c0 + args.chunk]
            paths = [os.path.join(args.out,
                                  f"kodim14var{c0 + i:02d}_l{lmbda:g}.cool")
                     for i in range(len(chunk))]
            t0 = time.time()
            res = encode_images_batched(chunk, cfgs, preset, paths,
                                        seed=c0, verbose=True,
                                        rdoq=True, profile=args.profile)
            dt = time.time() - t0
            for i, r in enumerate(res):
                # decode-back verification (reference cc_encode.py:447-504)
                dec = decode_video(paths[i])["0"]
                d = np.asarray(dec.data) - np.asarray(chunk[i].data)
                mse = float((d * d).mean())
                dec_psnr = -10 * np.log10(max(mse, 1e-10))
                assert abs(dec_psnr - r["psnr_db"]) < 0.3, \
                    (paths[i], dec_psnr, r["psnr_db"])
                rows.append((lmbda, f"kodim14-recompression-var{c0 + i:02d}",
                             r["n_pixels"], r["loss"], dec_psnr,
                             r["rate_bpp"]))
            n_done += len(chunk)
            print(f"[sweep] lmbda {lmbda:g} chunk {c0}: {len(chunk)} imgs in "
                  f"{dt:.0f}s ({len(chunk) / dt:.3f} img/s)", flush=True)

    wall = time.time() - t_all
    tsv = os.path.join(args.out, "image-kodak-recompression-sweep.tsv")
    with open(tsv, "w") as f:
        f.write("lmbda\tseq_name\tn_pixels\tloss\tpsnr_db\trate_bpp\n")
        for r in rows:
            f.write(f"{r[0]:g}\t{r[1]}\t{r[2]}\t{r[3]:.6f}\t{r[4]:.4f}\t"
                    f"{r[5]:.4f}\n")
    bench = {
        "metric": "batch_encode_img_per_s_full_pipeline",
        "value": round(n_done / wall, 4),
        "unit": "img/s/chip",
        "detail": {"n_images": n_done, "wall_s": round(wall, 1),
                   "n_itr": args.n_itr, "op": args.op,
                   "incl": "warmup+train+quantize+rdoq+bitstream+decode-back"},
    }
    with open(os.path.join(args.out, "BENCH_batch_encode.json"), "w") as f:
        f.write(json.dumps(bench) + "\n")
    print(json.dumps(bench), flush=True)


if __name__ == "__main__":
    main()
