"""Round-3 Kodak-surrogate sweep report (VERDICT r2 item 2).

Converts the pair-sweep TSV (samples/encode_kodak_batch.py --pairs) into the
reference schema (`lmbda seq_name n_pixels loss psnr_db rate_bpp`, cf.
/root/reference/results/v5.0/image-kodak.tsv) and computes BD-rate of our
averaged 5-λ curve against two reference anchors:

  - the reference's kodim14 row (same SOURCE pixels as our surrogate set:
    every slot is a flip/channel-permutation of the reference-decoded
    kodim14 — the only full-size content in this zero-egress env), and
  - the reference's full 24-image Kodak average (apples-to-oranges on
    CONTENT, reported with that caveat).

`loss` column matches the reference definition: 1e3 * (mse_[0-1] + λ·bpp).
"""

from __future__ import annotations

import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_TSV = "/root/reference/results/v5.0/image-kodak.tsv"


def read_tsv(path):
    with open(path) as f:
        header = f.readline().strip().split("\t")
        rows = [dict(zip(header, line.strip().split("\t")))
                for line in f if line.strip()]
    return rows


def avg_curve(rows, lam_key="lmbda", r="rate_bpp", p="psnr_db"):
    """per-λ (rate, psnr) means, sorted by rate ascending."""
    by = {}
    for row in rows:
        by.setdefault(float(row[lam_key]), []).append(
            (float(row[r]), float(row[p])))
    pts = [(sum(a for a, _ in v) / len(v), sum(b for _, b in v) / len(v))
           for _, v in sorted(by.items(), reverse=True)]
    return sorted(pts)


def main():
    from coolchic_tpu.utils.results import bd_rate

    ours_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(HERE, "results/round3/kodak/image-kodak-batch.tsv")
    out_tsv = os.path.join(HERE, "results/round3/image-kodak-batch.tsv")

    ours = read_tsv(ours_path)
    with open(out_tsv, "w") as f:
        f.write("lmbda\tseq_name\tn_pixels\tloss\tpsnr_db\trate_bpp\n")
        for r in ours:
            lam, psnr = float(r["lmbda"]), float(r["psnr_db"])
            bpp = float(r["rate_bpp"])
            loss = 1e3 * (10 ** (-psnr / 10) + lam * bpp)
            f.write(f"{lam:g}\t{r['seq_name']}\t{r['n_pixels']}\t"
                    f"{loss:.6f}\t{psnr:.6f}\t{bpp:.6f}\n")
    print(f"wrote {out_tsv} ({len(ours)} rows)")

    ref = read_tsv(REF_TSV)
    ours_c = avg_curve(ours)
    ref14_c = avg_curve([r for r in ref if r["seq_name"] == "kodim14"])
    refall_c = avg_curve(ref)

    print("\nours (surrogate set avg):  " +
          " ".join(f"({r:.3f},{p:.2f})" for r, p in ours_c))
    print("ref kodim14:               " +
          " ".join(f"({r:.3f},{p:.2f})" for r, p in ref14_c))
    print("ref 24-img avg:            " +
          " ".join(f"({r:.3f},{p:.2f})" for r, p in refall_c))

    if len(ours_c) >= 3:
        ra, pa = zip(*ours_c)
        r14, p14 = zip(*ref14_c)
        rall, pall = zip(*refall_c)
        bd14 = bd_rate(list(ra), list(pa), list(r14), list(p14))
        bdall = bd_rate(list(ra), list(pa), list(rall), list(pall))
        print(f"\nBD-rate vs ref kodim14 (same-source pixels, recompression "
              f"caveat): {bd14:+.2f}%")
        print(f"BD-rate vs ref 24-image avg (different content, for context "
              f"only): {bdall:+.2f}%")


if __name__ == "__main__":
    main()
