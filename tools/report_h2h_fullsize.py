"""Full-size (512x768) matched-λ head-to-head table + BD-rate.

Ours: the identity slot `kodim14_p012` of the round-4/5 WITH-RDOQ pair
sweep, decoder-verified (results/round5/kodak/results_decoder.tsv).
Reference: the live reference encoder's decoder-verified kodim14full runs
at the same λ and budget (results/round3/ref/kodim14full_l1e-3,
results/round4/ref/kodim14full_l{4e-3,2e-2}).

Usage: python tools/report_h2h_fullsize.py [--ours results/round5/kodak]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_RUNS = {1e-3: "results/round3/ref/kodim14full_l1e-3",
            4e-3: "results/round4/ref/kodim14full_l4e-3",
            2e-2: "results/round4/ref/kodim14full_l2e-2"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="results/round5/kodak")
    ap.add_argument("--seq", default="kodim14_p012")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()

    from coolchic_tpu.utils.results import bd_rate

    ours = {}
    with open(os.path.join(HERE, args.ours, "results_decoder.tsv")) as f:
        hdr = f.readline().strip().split("\t")
        for ln in f:
            r = dict(zip(hdr, ln.strip().split("\t")))
            if r["seq_name"] == args.seq:
                assert r.get("ok", "1") == "1", f"decode-gate fail: {r}"
                ours[float(r["lmbda"])] = (float(r["rate_bpp"]),
                                           float(r["psnr_db_dec"]))
    ref = {}
    for lam, d in REF_RUNS.items():
        p = os.path.join(HERE, d, "0000-results_decoder.tsv")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            f.readline()
            _, psnr, bpp = f.readline().split()[:3]
        ref[lam] = (float(bpp), float(psnr))

    lams = sorted(set(ours) & set(ref))
    print(f"{'lambda':>8} {'ours bpp':>9} {'ours dB':>8} "
          f"{'ref bpp':>9} {'ref dB':>8} {'d_bpp%':>7} {'d_dB':>6}")
    rows = []
    for lam in lams:
        ob, op = ours[lam]
        rb, rp = ref[lam]
        rows.append({"lmbda": lam, "ours_bpp": ob, "ours_db": op,
                     "ref_bpp": rb, "ref_db": rp})
        print(f"{lam:8g} {ob:9.4f} {op:8.3f} {rb:9.4f} {rp:8.3f} "
              f"{100 * (ob / rb - 1):+7.1f} {op - rp:+6.2f}")
    out = {"seq": args.seq, "n_points": len(lams), "rows": rows}
    if len(lams) >= 2:
        bd = bd_rate([ours[l][0] for l in lams], [ours[l][1] for l in lams],
                     [ref[l][0] for l in lams], [ref[l][1] for l in lams])
        out["bd_rate_pct_ours_vs_ref"] = round(bd, 2)
        print(f"\n{len(lams)}-point BD-rate ours vs reference: {bd:+.2f}% "
              f"(negative = ours better)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
