#!/bin/bash
# Round-5 TPU job queue: waits for the kodak sweep (PID $1) to release the
# chip, then runs the remaining VERDICT-item jobs back to back under the
# chip lock, each bounded by a timeout. Logs land in results/round5/.
#
# Budgets: frame_cfg_args uses production 10k-iter schedules; itr_scale 0.5
# keeps the wall-clock inside the round while staying production-shaped
# (the 2000-iter COOLCHIC_ITR_FLOOR still applies).
set -u
SWEEP_PID="${1:-0}"
cd /root/repo
LOCK=tools/with_tpu_lock.sh
R5=results/round5

if [ "$SWEEP_PID" -gt 0 ]; then
    echo "[queue] waiting for sweep pid $SWEEP_PID"
    while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
    echo "[queue] sweep done at $(date)"
fi

# (decoder verification of the sweep runs in the sweep chain itself)

echo "[queue] 1/4 flow guidance A/B $(date)"
$LOCK timeout 4200 python tools/ab_flow_guidance.py --n_itr 2000 --seeds 2 \
    --json_out $R5/ab_flow_guidance.json > $R5/ab_flow_guidance.log 2>&1
echo "[queue] flow rc=$? $(date)"

echo "[queue] 2/4 waves wallclock $(date)"
$LOCK timeout 4800 python tools/waves_wallclock.py --itr_scale 0.5 \
    --json_out $R5/waves_wallclock.json > $R5/waves_wallclock.log 2>&1
echo "[queue] waves rc=$? $(date)"

echo "[queue] 3/4 wasserstein matched A/B $(date)"
$LOCK timeout 4200 python tools/ab_wasserstein_matched.py --n_itr 2000 \
    --out $R5/ab_wasserstein_matched.json > $R5/ab_wasserstein.log 2>&1
echo "[queue] wasserstein rc=$? $(date)"

echo "[queue] 4/4 17-frame hier-B GOP $(date)"
$LOCK timeout 5400 python tools/encode_gop17.py --itr_scale 0.5 \
    --out $R5/gop17 > $R5/gop17.log 2>&1
echo "[queue] gop17 rc=$? $(date)"

echo "[queue] all done $(date)"
