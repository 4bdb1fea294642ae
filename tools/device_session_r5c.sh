#!/bin/bash
# Round-5 resume session (part c) — reordered after part b's det_gauge
# crashed the TPU worker on its first dispatch twice in a row (both times
# as the FIRST heavy program after a wedge recovery; logs
# det_gauge.log / det_gauge2.log). Known-good arms run first so the
# round's guaranteed-value measurements land even if det keeps faulting:
#   bench (headline + measured fit utilization) -> flat-vmap A/B ->
#   det gauge (retried) -> windowed det 1k (resumable) ->
#   DET_FULL 24k loop bounded by a wall-clock deadline.
set -u
LOG=/root/repo/logs/r5_device
mkdir -p "$LOG"
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

probe() {
  timeout 120 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))" \
    >/dev/null 2>&1
}

wait_device() {
  n=0
  until probe; do
    n=$((n + 1))
    if [ "$n" -ge "${MAX_PROBES:-90}" ]; then
      echo "device never came back ($n probes)" | tee -a "$LOG/status"
      exit 1
    fi
    sleep 120
  done
}

run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$LOG/status"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG/status"
  wait_device
}

# retry_until <name> <per-attempt-timeout> <tries> <done-grep-file> <done-grep-pat> cmd...
retry_until() {
  name=$1; to=$2; maxtries=$3; donefile=$4; donepat=$5; shift 5
  tries=0
  while [ "$tries" -lt "$maxtries" ]; do
    tries=$((tries + 1))
    echo "=== $name attempt $tries $(date +%H:%M:%S)" | tee -a "$LOG/status"
    timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
    rc=$?
    echo "=== $name attempt $tries exit=$rc $(date +%H:%M:%S)" \
      | tee -a "$LOG/status"
    grep -q "$donepat" "$donefile" 2>/dev/null && {
      echo "$name DONE" | tee -a "$LOG/status"; return 0; }
    if [ -n "${DEADLINE:-}" ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "$name stopped at deadline" | tee -a "$LOG/status"; return 1
    fi
    wait_device
  done
  echo "$name exhausted retries" | tee -a "$LOG/status"
  return 1
}

wait_device
echo "device up for part c ($(date +%H:%M:%S))" | tee -a "$LOG/status"

# 1. headline bench with MEASURED fit utilization (VERDICT #7); its
# saturating calibration loops double as the post-wedge warm-up
run bench2 2400 python bench.py

# 2. flat-vmap A/B retry (part-a arm died on post-wedge FAILED_PRECONDITION)
run ab_flat2 "${FLAT_TO:-1800}" env DVT_FLAT_VMAP=1 python tools/ab_batchsize.py 1 2 4

# 3. det step-time gauge, retried — crashes here after a healthy 1+2 would
# isolate the fault to the det program rather than post-wedge chip state
retry_until det_gauge3 1200 2 \
  work_dirs/r5_det_gauge/eval_metrics.json '"iteration": 60' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 60 --eval_interval 60 \
  --ckpt_interval 0 --batch_size 2 --max_val_images 2 --num_workers 2 \
  --work_dir work_dirs/r5_det_gauge

# 4. windowed-attention detection: the >=1k-iter learning run (VERDICT #5);
# the windowed program is the det variant proven on this chip (r4 smoke)
retry_until det_window "${WIN_TO:-1800}" 4 \
  work_dirs/r5_det_window/eval_metrics.json '"iteration": 1000' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 1000 --eval_interval 250 \
  --ckpt_interval 250 --auto_resume --batch_size 2 --max_val_images 8 \
  --num_workers 2 --det_window_size 7 --det_add_pe --det_proposals 50 \
  --det_roi_sample 32 --work_dir work_dirs/r5_det_window

# 5. full-recipe detection, resumable, bounded by the round deadline
DEADLINE=${DET_DEADLINE:-$(($(date +%s) + 14400))}
retry_until det_full "${DET_TO:-2400}" "${DET_TRIES:-12}" \
  work_dirs/r5_det_full/eval_metrics.json '"iteration": 24000' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --eval_interval 2000 \
  --ckpt_interval 500 --auto_resume \
  --batch_size 2 --max_val_images 8 --num_workers 2 \
  --work_dir work_dirs/r5_det_full

echo "ALL DONE part c $(date +%H:%M:%S)" | tee -a "$LOG/status"
