"""Decoder-verify a pair-sweep TSV: decode every .cool on the HOST (CPU
JAX + C++ rangecoder — the chip stays free for encoding) and compare the
decoded PSNR against the encoder-reported row, reference
`results_decoder.tsv` style (reference cc_encode.py decode-back check).

Usage:
  JAX_PLATFORMS=cpu python tools/verify_sweep_tsv.py \
      --tsv results/round3/kodak/image-kodak-batch.tsv \
      --dir results/round3/kodak [--image tests/data/...png]
Writes <dir>/results_decoder.tsv and flags rows off by > 0.3 dB.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True)
    ap.add_argument("--dir", required=True)
    ap.add_argument("--image", default=None,
                    help="base image of the variant set (default kodim14)")
    ap.add_argument("--n_images", type=int, default=24)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # env var alone does not stick under the axon sitecustomize
    # (tests/conftest.py) -- without this the "host" decode contends for
    # the remote chip claim against a running sweep
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from samples.encode_kodak_batch import KODIM14, build_kodak_targets
    from coolchic_tpu.bitstream.decode import decode_video

    frames, names = build_kodak_targets(args.n_images,
                                        image=args.image or KODIM14)
    by_name = {n: f for n, f in zip(names, frames)}

    with open(args.tsv) as f:
        header = f.readline().strip().split("\t")
        rows = [dict(zip(header, ln.strip().split("\t"))) for ln in f if ln.strip()]

    out_path = os.path.join(args.dir, "results_decoder.tsv")
    bad = 0
    with open(out_path, "w") as out:
        out.write("lmbda\tseq_name\tpsnr_db_dec\tpsnr_db_enc\trate_bpp\tok\n")
        for r in rows:
            name, lam = r["seq_name"], float(r["lmbda"])
            cool = os.path.join(args.dir, f"{name}_l{lam:g}.cool")
            if not os.path.exists(cool) or name not in by_name:
                continue
            # FrameData.data is float in [0,1] (io/framedata.py)
            dec = np.asarray(decode_video(cool)["0"].data).astype(np.float64)
            src = np.asarray(by_name[name].data).astype(np.float64)
            mse = ((dec - src) ** 2).mean()
            psnr = -10 * math.log10(max(mse, 1e-12))
            enc = float(r["psnr_db"])
            ok = abs(psnr - enc) < 0.3
            bad += not ok
            out.write(f"{lam:g}\t{name}\t{psnr:.4f}\t{enc:.4f}\t"
                      f"{float(r['rate_bpp']):.6f}\t{int(ok)}\n")
    print(f"wrote {out_path}; {bad} rows off by >0.3 dB")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
