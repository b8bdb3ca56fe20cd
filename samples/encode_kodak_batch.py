"""Batched Kodak-set encode: N same-size images x M lambda points, each
lambda as a few jitted batched programs on one chip.

The reference sweeps the Kodak set with one subprocess per image chained by
slurm `afterok` (reference samples/encode.py:147-183, _getcodingstruct.py);
here the image batch IS the program (`parallel/encode_batch.py`), so the
judged metric is full-encode throughput in img/s/chip INCLUDING warm-up,
training, NN quantization, RDOQ and bitstream write.

Zero-egress caveat: the only full-size Kodak content in this environment is
the reference-decoded kodim14 (512x768, tests/data/kodim14_ref_decode.png).
The 24-image set is therefore built as 24 DISTINCT targets -- 4 spatial
flips x 6 channel permutations of that image. Every slot overfits its own
network to genuinely different pixels, so throughput is representative of
24 arbitrary same-size images (RD numbers stay a recompression task, same
caveat as results/round1/README.md).

Usage:
  python samples/encode_kodak_batch.py --n_images 24 --chunk 4 \
      --n_itr 3000 --lmbdas 1e-3 --out /tmp/kodak_batch
"""

from __future__ import annotations

import argparse
import itertools
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KODIM14 = os.path.join(HERE, "tests", "data", "kodim14_ref_decode.png")


def build_kodak_targets(n_images: int, image: str = KODIM14):
    """n distinct [1,3,H,W] rgb FrameData variants of the base image: flips x
    channel permutations (24 = 4 x 6 unique combinations, then wraps).
    n_images=1 returns the base image itself (identity slot)."""
    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.io.io import load_frame_data_from_file

    base = load_frame_data_from_file(image)
    img = np.asarray(base.data)  # [1,3,H,W]
    flips = [(False, False), (True, False), (False, True), (True, True)]
    perms = list(itertools.permutations(range(3)))
    frames, names = [], []
    for i in range(n_images):
        fv, fh = flips[(i // 6) % 4]
        perm = perms[i % 6]
        v = img[:, list(perm)]
        if fv:
            v = v[:, :, ::-1]
        if fh:
            v = v[:, :, :, ::-1]
        frames.append(FrameData(base.bitdepth, "rgb", np.ascontiguousarray(v)))
        if image != KODIM14:
            # full stem, minus a leading WxH size token (so two images that
            # share a size prefix still get unique slot names)
            stem = os.path.splitext(os.path.basename(image))[0]
            parts = stem.split("_")
            if len(parts) > 1 and re.fullmatch(r"\d+x\d+", parts[0]):
                stem = "_".join(parts[1:])
        else:
            stem = "kodim14"
        names.append(f"{stem}_p{''.join(map(str, perm))}"
                     f"{'_fv' if fv else ''}{'_fh' if fh else ''}")
    return frames, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=24)
    ap.add_argument("--image", default=KODIM14,
                    help="base image for the flip/permutation variants")
    ap.add_argument("--first_image", type=int, default=0,
                    help="start at this image index (resume a partial sweep)")
    ap.add_argument("--chunk", type=int, default=4,
                    help="images per jitted batch (activation-memory bound)")
    ap.add_argument("--n_itr", type=int, default=3000)
    ap.add_argument("--start_lr", type=float, default=1e-2)
    ap.add_argument("--lmbdas", default="1e-3",
                    help="comma-separated lambda list")
    ap.add_argument("--op", default="hop", help="intra operating point")
    ap.add_argument("--profile", default="ref", choices=["ref", "tpu"])
    ap.add_argument("--no_rdoq", action="store_true")
    ap.add_argument("--out", default="/tmp/kodak_batch")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--crop", default="",
                    help="HxW center crop for smoke tests, e.g. 64x96")
    ap.add_argument("--recipe", default="intra", choices=["intra", "debug"])
    ap.add_argument("--pairs", action="store_true",
                    help="sweep (image, lambda) PAIRS as mixed batch slots: "
                         "lambda is traced per slot, so a 24x5 sweep runs as "
                         "ceil(120/chunk) chunks instead of 5x ceil(24/chunk)")
    ap.add_argument("--first_slot", type=int, default=0,
                    help="with --pairs: resume at this slot index")
    ap.add_argument("--order", default="image_major",
                    choices=["image_major", "lambda_major"],
                    help="pair order: image_major completes full lambda "
                         "curves image-by-image (best for partial sweeps); "
                         "lambda_major keeps chunks single-lambda")
    ap.add_argument("--skip_done", action="store_true",
                    help="skip slots whose .cool already exists")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.parallel.encode_batch import encode_images_batched
    from coolchic_tpu.train.presets import PresetDebug, PresetIntra
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

    frames, names = build_kodak_targets(args.first_image + args.n_images,
                                        image=args.image)
    frames, names = frames[args.first_image:], names[args.first_image:]
    if args.crop:
        ch, cw = (int(x) for x in args.crop.split("x"))
        for fr in frames:
            hh, ww = fr.img_size
            y0, x0 = (hh - ch) // 2, (ww - cw) // 2
            fr.data = np.ascontiguousarray(
                fr.data[:, :, y0:y0 + ch, x0:x0 + cw])
    h, w = frames[0].img_size
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS[args.op], (h, w))}
    os.makedirs(args.out, exist_ok=True)
    lmbdas = [float(x) for x in args.lmbdas.split(",")]

    tsv = os.path.join(args.out, "image-kodak-batch.tsv")
    new = not os.path.exists(tsv)
    rows = 0
    t_all = time.time()
    n_done = 0
    with open(tsv, "a") as f:
        if new:
            f.write("lmbda\tseq_name\tpsnr_db\trate_bpp\tn_bytes\tn_pixels\t"
                    "chunk_s\timg_per_s_chunk\n")
        if args.pairs:
            # (image, λ) slots, λ-major so each chunk mixes rate points of
            # the SAME pixels only when n_images < chunk; image-major keeps
            # resume simple. Preset λ is a placeholder — per-slot λ wins.
            if args.order == "lambda_major":
                slots = [(fi, lm) for lm in lmbdas for fi in range(len(frames))]
            else:
                slots = [(fi, lm) for fi in range(len(frames)) for lm in lmbdas]
            # keep each slot's ABSOLUTE index: the chunk seed derives from
            # it, so a --first_slot/--skip_done resume that lands on the
            # same chunk boundaries reproduces the uninterrupted run
            slots = list(enumerate(slots))[args.first_slot:]
            if args.skip_done:
                slots = [(si, (fi, lm)) for si, (fi, lm) in slots
                         if not os.path.exists(
                             os.path.join(args.out, f"{names[fi]}_l{lm:g}.cool"))]
            # group slots by the reference's λ-adaptive encoder gain
            # (video.py intra_gain_for_lmbda: gain 24/20/16): the gain is a
            # STATIC config, so a chunk must be single-gain; within a group
            # mixed-λ batching still applies. Order within a group preserved.
            from coolchic_tpu.train.video import intra_gain_for_lmbda

            groups: dict[int, list] = {}
            for s in slots:
                groups.setdefault(intra_gain_for_lmbda(s[1][1]), []).append(s)
            mk = PresetIntra if args.recipe == "intra" else PresetDebug
            gain_chunks = []
            for gain in sorted(groups, reverse=True):
                g_slots = groups[gain]
                for c0 in range(0, len(g_slots), args.chunk):
                    gain_chunks.append((gain, g_slots[c0:c0 + args.chunk]))
            for chunk_idx, (gain, sl) in enumerate(gain_chunks):
                chunk = [frames[fi] for _, (fi, _) in sl]
                cnames = [names[fi] for _, (fi, _) in sl]
                clams = [lm for _, (_, lm) in sl]
                # mixed-λ chunks are fully supported: per-slot λ drives the
                # loss AND the λ-derived warm-up noise (preset.
                # warmup_noise_parameter per slot); the preset's own λ is
                # only a placeholder for schedule lengths. Encoder gain is
                # fixed per chunk by the grouping above.
                import dataclasses

                g_cfgs = {k: dataclasses.replace(v, encoder_gain=gain)
                          for k, v in cfgs.items()}
                preset = mk(lmbda=clams[0], start_lr=args.start_lr,
                            itr_main_training=args.n_itr)
                outs = [os.path.join(args.out, f"{n_}_l{lm:g}.cool")
                        for n_, lm in zip(cnames, clams)]
                t0 = time.time()

                # crash-resilient side rows, flushed per IMAGE: a tunnel
                # hang later in the chunk must not lose completed images'
                # verification rows (the batch TSV stays authoritative for
                # throughput; tools/recover_sweep_tsv.py covers older logs)
                side = os.path.join(args.out, "image-kodak-rows.tsv")
                if not os.path.exists(side):
                    with open(side, "w") as sf:
                        sf.write("lmbda\tseq_name\tpsnr_db\trate_bpp\t"
                                 "n_bytes\tn_pixels\tchunk_s\t"
                                 "img_per_s_chunk\n")

                def on_image(i, r, _names=cnames, _lams=clams, _t0=t0):
                    el = time.time() - _t0
                    with open(side, "a") as sf:
                        sf.write(f"{_lams[i]:g}\t{_names[i]}\t"
                                 f"{r['psnr_db']:.4f}\t{r['rate_bpp']:.6f}\t"
                                 f"{r['n_bytes']}\t{r['n_pixels']}\t"
                                 f"{el:.1f}\t0.0000\n")

                res = encode_images_batched(chunk, g_cfgs, preset, outs,
                                            seed=sl[0][0], verbose=True,
                                            rdoq=not args.no_rdoq,
                                            profile=args.profile,
                                            lmbdas=clams,
                                            on_image=on_image)
                dt = time.time() - t0
                for r, n_, lm in zip(res, cnames, clams):
                    f.write(f"{lm:g}\t{n_}\t{r['psnr_db']:.4f}\t"
                            f"{r['rate_bpp']:.6f}\t{r['n_bytes']}\t"
                            f"{r['n_pixels']}\t{dt:.1f}\t"
                            f"{len(res) / dt:.4f}\n")
                    rows += 1
                f.flush()
                n_done += len(res)
                print(f"[{n_done + args.first_slot}/{len(frames) * len(lmbdas)}] "
                      f"pair-chunk {chunk_idx} (gain {gain}): {len(res)} slots in "
                      f"{dt:.1f}s = {len(res) / dt:.3f} img/s", flush=True)
            wall = time.time() - t_all
            print(f"TOTAL {n_done} full encodes (n_itr={args.n_itr}, "
                  f"{'no ' if args.no_rdoq else ''}rdoq) in {wall:.1f}s = "
                  f"{n_done / wall:.4f} img/s/chip -> {tsv}", flush=True)
            return
        for lmbda in lmbdas:
            mk = PresetIntra if args.recipe == "intra" else PresetDebug
            preset = mk(lmbda=lmbda, start_lr=args.start_lr,
                        itr_main_training=args.n_itr)
            for c0 in range(0, len(frames), args.chunk):
                chunk = frames[c0:c0 + args.chunk]
                cnames = names[c0:c0 + args.chunk]
                outs = [os.path.join(args.out, f"{n}_l{lmbda:g}.cool")
                        for n in cnames]
                t0 = time.time()
                res = encode_images_batched(chunk, cfgs, preset, outs,
                                            seed=c0, verbose=True,
                                            rdoq=not args.no_rdoq,
                                            profile=args.profile)
                dt = time.time() - t0
                for r, n in zip(res, cnames):
                    f.write(f"{lmbda:g}\t{n}\t{r['psnr_db']:.4f}\t"
                            f"{r['rate_bpp']:.6f}\t{r['n_bytes']}\t"
                            f"{r['n_pixels']}\t{dt:.1f}\t"
                            f"{len(res) / dt:.4f}\n")
                    rows += 1
                f.flush()
                n_done += len(res)
                print(f"[{n_done}/{len(frames) * len(lmbdas)}] lmbda {lmbda:g} "
                      f"chunk {c0 // args.chunk}: {len(res)} imgs in {dt:.1f}s "
                      f"= {len(res) / dt:.3f} img/s", flush=True)

    wall = time.time() - t_all
    print(f"TOTAL {n_done} full encodes (n_itr={args.n_itr}, "
          f"{'no ' if args.no_rdoq else ''}rdoq) in {wall:.1f}s = "
          f"{n_done / wall:.4f} img/s/chip -> {tsv}", flush=True)


if __name__ == "__main__":
    main()
