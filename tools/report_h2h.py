"""Matched-λ head-to-head table vs the reference encoder.

Merges our pair-batch encode of 192x128 kodim15 (5 λ, hop, n_itr=3000,
decoder-verified via tools/verify_sweep_tsv.py) with the live reference
encoder's decoder-verified results on the SAME pixels / λ / architecture /
budget (tools/run_ref_headtohead.sh -> results/round3/ref/*/
0000-results_decoder.tsv), and prints per-λ deltas + 5-point BD-rate.

Round 4 runs BOTH sides with RDOQ (docs/tpu_rdoq_issue.md documents the
round-3 disablement and its resolution); default paths point at the
round-4 sweep. Use --ours to point at another sweep directory.
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

LAMS = ["1e-4", "4e-4", "1e-3", "4e-3", "2e-2"]
DEFAULT_OURS = "results/round4/h2h_kodim15_v3"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default=DEFAULT_OURS,
                    help="sweep dir containing results_decoder.tsv (preferred)"
                         " or image-kodak-batch.tsv")
    args = ap.parse_args()

    from coolchic_tpu.utils.results import bd_rate

    ours = {}
    dec_tsv = os.path.join(HERE, args.ours, "results_decoder.tsv")
    enc_tsv = os.path.join(HERE, args.ours, "image-kodak-batch.tsv")
    src = dec_tsv if os.path.exists(dec_tsv) else enc_tsv
    psnr_col = "psnr_db_dec" if src == dec_tsv else "psnr_db"
    with open(src) as f:
        hdr = f.readline().strip().split("\t")
        for ln in f:
            r = dict(zip(hdr, ln.strip().split("\t")))
            ours[float(r["lmbda"])] = (float(r["rate_bpp"]),
                                       float(r[psnr_col]))
    print(f"ours: {src}" + ("" if src == dec_tsv else
                            "  (ENCODER-side; run tools/verify_sweep_tsv.py)"))

    ref = {}
    for lam in LAMS:
        p = os.path.join(HERE, f"results/round3/ref/kodim15_l{lam}/"
                               "0000-results_decoder.tsv")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            f.readline()
            loss, psnr, bpp = f.readline().split()[:3]
        ref[float(lam)] = (float(bpp), float(psnr))

    print(f"{'lmbda':>8} {'ours bpp':>9} {'ours dB':>8} {'ref bpp':>9} "
          f"{'ref dB':>8} {'d_dB@ours_rate':>14}")
    ra, pa, rb, pb = [], [], [], []
    for lam in sorted(set(ours) & set(ref), reverse=True):
        (obpp, odb), (rbpp, rdb) = ours[lam], ref[lam]
        print(f"{lam:8g} {obpp:9.4f} {odb:8.3f} {rbpp:9.4f} {rdb:8.3f} "
              f"{odb - rdb:+8.3f} (at {obpp / rbpp * 100:.0f}% of ref rate)")
        ra.append(obpp); pa.append(odb); rb.append(rbpp); pb.append(rdb)
    if len(ra) >= 3:
        bd = bd_rate(ra, pa, rb, pb)
        print(f"\n{len(ra)}-point BD-rate ours vs reference "
              f"(negative = ours better): {bd:+.2f}%")


if __name__ == "__main__":
    main()
