"""Rebuild pair-sweep TSV rows from run.log `image N: ...` lines.

The batch TSV flushes one row per CHUNK; a tunnel hang inside a chunk's
per-image tail (docs/tpu_rdoq_issue.md round-5 addendum) loses every row of
that chunk even though the per-image `.cool` files and the encoder-side
PSNR/bpp prints survive in run.log. This tool reconstructs a verification
TSV (same schema; chunk_s / img_per_s are 0 — NOT usable for throughput)
from the log + the bitstream file sizes, deduplicating on the output path
(last win).

Usage:
  python tools/recover_sweep_tsv.py --log results/round5/kodak/run.log \
      --out results/round5/kodak/image-kodak-recovered.tsv
"""

from __future__ import annotations

import argparse
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    pat = re.compile(
        r"^image \d+: psnr ([\d.]+) dB, ([\d.]+) bpp -> (\S+\.cool)\s*$")
    rows = {}
    for ln in open(args.log):
        m = pat.match(ln)
        if not m:
            continue
        psnr, bpp, path = float(m.group(1)), float(m.group(2)), m.group(3)
        stem = os.path.splitext(os.path.basename(path))[0]
        seq, lam = stem.rsplit("_l", 1)
        if not os.path.exists(path):
            continue
        n_bytes = os.path.getsize(path)
        n_pixels = round(8 * n_bytes / bpp) if bpp else 0
        rows[path] = (float(lam), seq, psnr, bpp, n_bytes, n_pixels)

    with open(args.out, "w") as f:
        f.write("lmbda\tseq_name\tpsnr_db\trate_bpp\tn_bytes\tn_pixels\t"
                "chunk_s\timg_per_s_chunk\n")
        for path in sorted(rows):
            lam, seq, psnr, bpp, n_bytes, n_pixels = rows[path]
            f.write(f"{lam:g}\t{seq}\t{psnr:.4f}\t{bpp:.6f}\t{n_bytes}\t"
                    f"{n_pixels}\t0.0\t0.0000\n")
    print(f"recovered {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
