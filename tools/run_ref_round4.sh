#!/bin/bash
# Round-4 reference-encoder runs (VERDICT r3 items 5 and 8): finish the
# full-size kodim14 reference curve the round-3 README cites (l4e-3 ended
# mid-run at snapshot time) and add the high-rate l2e-2 point for the
# "beat the reference at high lambda" stretch goal. Same recipe as
# tools/run_ref_headtohead.sh: reference torch encoder on CPU, nice'd,
# decoder-verified TSVs.
#
# Usage: nohup bash tools/run_ref_round4.sh > /tmp/ref_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo/tools/ref_shims:/root/reference/coolchic:/root/reference
export OMP_NUM_THREADS=2
REF=/root/reference/cc_encode.py
OUT=results/round4/ref
mkdir -p "$OUT"

run() {
  local tag="$1"; shift
  local wd="/root/repo/$OUT/$tag"
  if [ -f "$wd/results_decoder.tsv" ] || compgen -G "$wd/0000-results_decoder.tsv" > /dev/null; then
    echo "== $tag already done"; return
  fi
  mkdir -p "$wd"
  echo "== $tag start $(date +%T)"
  nice -n 19 python "$REF" --workdir "$wd" -o "$wd/out.cool" "$@" \
      > "$wd/run.log" 2>&1
  echo "== $tag rc=$? end $(date +%T)"
  cat "$wd"/*results_decoder.tsv 2>/dev/null
}

# Full-size 512x768 kodim14, n_itr=3000, hop — matched to the TPU sweep's
# kodim14 identity slot budget. 1e-3 finished in round 3
# (results/round3/ref/kodim14full_l1e-3); 4e-3 and 2e-2 run here.
for L in 4e-3 2e-2; do
  run "kodim14full_l${L}" -i /root/repo/tests/data/kodim14_ref_decode.png --lmbda "$L" \
      --n_itr 3000 --start_lr 0.01 --dec_cfg_residue /root/repo/cfg/dec/intra/hop.cfg
done

echo "== all round-4 reference runs done $(date +%T)"
