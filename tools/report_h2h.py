"""Round-3 matched-λ head-to-head table (VERDICT r2 item 4).

Merges our pair-batch encode of 192x128 kodim15 (5 λ, hop, n_itr=3000,
decoder-verified via tools/verify_sweep_tsv.py) with the live reference
encoder's decoder-verified results on the SAME pixels / λ / architecture /
budget (tools/run_ref_headtohead.sh -> results/round3/ref/*/
0000-results_decoder.tsv), and prints per-λ deltas + 5-point BD-rate.

Ours ran WITHOUT RDOQ this round (TPU RDOQ issue, results/round3/README.md)
— the reference side keeps its RDOQ advantage, so deltas are conservative
for us.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

LAMS = ["1e-4", "4e-4", "1e-3", "4e-3", "2e-2"]


def main():
    from coolchic_tpu.utils.results import bd_rate

    ours_tsv = os.path.join(HERE, "results/round3/h2h_kodim15/image-kodak-batch.tsv")
    ours = {}
    with open(ours_tsv) as f:
        hdr = f.readline().strip().split("\t")
        for ln in f:
            r = dict(zip(hdr, ln.strip().split("\t")))
            ours[float(r["lmbda"])] = (float(r["rate_bpp"]), float(r["psnr_db"]))

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
