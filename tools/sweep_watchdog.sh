#!/bin/bash
# Restart-on-stall wrapper for the round-5 kodak sweep.
#
# The axon tunnel connection intermittently drops and reconnects; the op
# in flight on the old connection is lost and the client blocks forever
# (docs/tpu_rdoq_issue.md round-5 addendum — observed twice this round,
# ~80 min apart). The per-image tail now heartbeats into run.log every
# probe sweep, so a log-mtime stall of STALL_S seconds means a lost op:
# kill the exact client PID and resume with --skip_done until every
# expected .cool exists, then decoder-verify and emit the h2h report.
set -u
cd /root/repo
OUT=results/round5/kodak
STALL_S="${STALL_S:-720}"
LOG=$OUT/run.log

expected_done() {
    local n
    n=$(ls $OUT/*_l0.001.cool $OUT/*_l0.004.cool $OUT/*_l0.02.cool \
        2>/dev/null | wc -l)
    [ "$n" -ge 18 ]
}

attempt=0
while ! expected_done && [ $attempt -lt 8 ]; do
    attempt=$((attempt + 1))
    echo "[watchdog] attempt $attempt $(date)" >> "$LOG"
    tools/with_tpu_lock.sh python samples/encode_kodak_batch.py \
        --n_images 6 --chunk 6 --n_itr 3000 --lmbdas 1e-3,4e-3,2e-2 \
        --pairs --skip_done --out $OUT >> "$LOG" 2>&1 &
    WRAP=$!
    sleep 10
    while kill -0 $WRAP 2>/dev/null; do
        sleep 60
        age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
        if [ "$age" -gt "$STALL_S" ]; then
            echo "[watchdog] stall ${age}s, killing client $(date)" >> "$LOG"
            pkill -9 -P "$WRAP" 2>/dev/null
            kill -9 "$WRAP" 2>/dev/null
            sleep 5
            break
        fi
    done
    wait $WRAP 2>/dev/null
done

if expected_done; then
    echo "[watchdog] sweep complete $(date)" >> "$LOG"
    JAX_PLATFORMS=cpu timeout 3000 python tools/verify_sweep_tsv.py \
        --tsv $OUT/image-kodak-batch.tsv --dir $OUT --n_images 6 \
        > $OUT/verify.log 2>&1
    python tools/report_h2h_fullsize.py \
        --json_out results/round5/h2h_fullsize.json \
        > results/round5/h2h_fullsize.log 2>&1
    echo "[watchdog] verify+report done $(date)" >> "$LOG"
else
    echo "[watchdog] GAVE UP after $attempt attempts $(date)" >> "$LOG"
    exit 1
fi
