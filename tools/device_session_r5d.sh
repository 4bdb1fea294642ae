#!/bin/bash
# Round-5 resume session (part d) — root cause of the det worker crashes
# found: parts b/c ran `voc_det` with the DEFAULT --det_proposals 300 /
# --det_roi_sample 128, but the only det config ever proven on the tunnel
# chip is --det_proposals 64 (RESULTS.md §3: "to fit the tunnel watchdog";
# the r4 windowed smoke used 50/32). With the defaults the first train
# dispatch exceeds the axon ~2-min watchdog and the worker is killed —
# reproduced 3x this round on otherwise-healthy sessions (det_gauge*.log).
#
# Order: the windowed >=1k-iter learning run first (proven 50/32 config,
# VERDICT #5's highest-value item), then the step-time gauge at the
# r3-proven 64-proposal config, then the deadline-bounded resumable
# DET_FULL loop at that same watchdog-safe config (deviation documented).
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
echo "device up for part d ($(date +%H:%M:%S))" | tee -a "$LOG/status"

# 1. windowed-attention detection: the >=1k-iter learning run (VERDICT #5)
retry_until det_window "${WIN_TO:-1800}" 3 \
  work_dirs/r5_det_window/eval_metrics.json '"iteration": 1000' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 1000 --eval_interval 250 \
  --ckpt_interval 250 --auto_resume --batch_size 2 --max_val_images 8 \
  --num_workers 2 --det_window_size 7 --det_add_pe --det_proposals 50 \
  --det_roi_sample 32 --work_dir work_dirs/r5_det_window

# 2. det step-time gauge at the r3-proven watchdog-safe proposal count
retry_until det_gauge4 1200 2 \
  work_dirs/r5_det_gauge4/eval_metrics.json '"iteration": 60' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 60 --eval_interval 60 \
  --ckpt_interval 0 --batch_size 2 --max_val_images 2 --num_workers 2 \
  --det_proposals 64 --work_dir work_dirs/r5_det_gauge4

# 3. full-recipe detection (24k iters, step-LR 20k/22k), resumable,
# deadline-bounded; 64-proposal tunnel-watchdog deviation documented
DEADLINE=${DET_DEADLINE:-$(($(date +%s) + 14400))}
retry_until det_full "${DET_TO:-2400}" "${DET_TRIES:-12}" \
  work_dirs/r5_det_full/eval_metrics.json '"iteration": 24000' \
  python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --eval_interval 2000 \
  --ckpt_interval 500 --auto_resume \
  --batch_size 2 --max_val_images 8 --num_workers 2 \
  --det_proposals 64 --work_dir work_dirs/r5_det_full

echo "ALL DONE part d $(date +%H:%M:%S)" | tee -a "$LOG/status"
