#!/bin/bash
# Reference-encoder runs for the round-3 RD head-to-head (VERDICT r2 item 4).
# Runs the REFERENCE torch encoder (via tools/ref_shims) on this host's CPU,
# nice'd so it yields to the TPU-side work. Sequential; each run's
# decoder-verified results land in results/round3/ref/<tag>/results_decoder.tsv.
#
# Usage: nohup bash tools/run_ref_headtohead.sh > /tmp/ref_h2h.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo/tools/ref_shims:/root/reference/coolchic:/root/reference
export OMP_NUM_THREADS=2
REF=/root/reference/cc_encode.py
OUT=results/round3/ref
mkdir -p "$OUT"

run() {
  local tag="$1"; shift
  local wd="/root/repo/$OUT/$tag"   # ABSOLUTE: the ref encoder writes the
  # bitstream relative to its own cwd (reference bitstream/encode.py:92)
  if [ -f "$wd/results_decoder.tsv" ]; then echo "== $tag already done"; return; fi
  mkdir -p "$wd"
  echo "== $tag start $(date +%T)"
  nice -n 19 python "$REF" --workdir "$wd" -o "$wd/out.cool" "$@" \
      > "$wd/run.log" 2>&1
  echo "== $tag rc=$? end $(date +%T)"
  cat "$wd/results_decoder.tsv" 2>/dev/null
}

# 1. 5-lambda RD curve on 192x128 kodim15 (full intra recipe budget n_itr=3000).
for L in 1e-4 4e-4 1e-3 4e-3 2e-2; do
  run "kodim15_l${L}" -i /root/repo/tests/data/192x128_kodim15.png --lmbda "$L" \
      --n_itr 3000 --start_lr 0.01 --dec_cfg_residue /root/repo/cfg/dec/intra/hop.cfg
done

# 2. YUV420 8b input at lambda=1e-3.
run "kodim15_yuv420_l1e-3" -i /root/repo/tests/data/kodim15_192x128_01p_yuv420_8b.yuv \
    --lmbda 1e-3 --n_itr 3000 --start_lr 0.01 \
    --dec_cfg_residue /root/repo/cfg/dec/intra/hop.cfg

# 3. Full-size 512x768 at 2 lambdas, n_itr=3000 — matched to the round-3
#    Kodak pair-sweep budget so the sweep's kodim14 identity slot (same
#    pixels) is directly comparable. ~1-2h/run on this host's CPU.
for L in 1e-3 4e-3; do
  run "kodim14full_l${L}" -i /root/repo/tests/data/kodim14_ref_decode.png --lmbda "$L" \
      --n_itr 3000 --start_lr 0.01 --dec_cfg_residue /root/repo/cfg/dec/intra/hop.cfg
done

echo "== all reference runs done $(date +%T)"
