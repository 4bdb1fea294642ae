#!/bin/bash
# Round-5 serialized device measurement session.
#
# Only one process may touch the TPU at a time; host CPU contention
# starves the tunnel. Logs under logs/r5_device/ (in-tree so evidence
# survives the sandbox — r4 lesson).
#
# Steps (VERDICT r4 next-round list):
#   decomp       ST23_DECOMP=1 bench_stage23   - stage-3 step decomposition (#1)
#   stage23      bench_stage23                 - full grid, settle-block
#                                                methodology + bs8/16/32 (#1,#2)
#   ab_batchsize tools/ab_batchsize.py         - stage-1 vmap scaling     (#3)
#   bench        bench.py                      - headline + MEASURED fit
#                                                utilization (cost analysis) (#7)
#   det_gauge    short voc_det run             - step-time gauge for the
#                                                DET_FULL go/no-go        (#5)
#   det_window   1k-iter windowed detection    - windowed learning run    (#5)
#   DET_FULL=1   24k-iter full recipe with --auto_resume in a retry loop:
#                survives chip wedges via the new probe checkpoints       (#4,#5)
set -u
LOG=/root/repo/logs/r5_device
mkdir -p "$LOG"
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

probe() {
  timeout 90 python -c \
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

wait_device
echo "device up ($(date +%H:%M:%S))" | tee -a "$LOG/status"

if [ "${DET_FULL:-0}" = "1" ]; then
  # Full-recipe detection (24k iters, synthetic VOC, step-LR drops at
  # 20k/22k). --auto_resume + --ckpt_interval make each attempt continue
  # from the last checkpoint, so chip wedges cost only the uncheckpointed
  # tail; the loop retries until the run reports the final iteration.
  tries=0
  while [ "$tries" -lt "${DET_TRIES:-12}" ]; do
    tries=$((tries + 1))
    echo "=== det_full attempt $tries $(date +%H:%M:%S)" | tee -a "$LOG/status"
    timeout "${DET_TO:-14400}" python evaluate_dense_tasks.py voc_det \
      --data_root /tmp/dvt_synth/voc --eval_interval 2000 \
      --ckpt_interval 500 --auto_resume \
      --batch_size 2 --max_val_images 8 --num_workers 2 \
      --work_dir work_dirs/r5_det_full >>"$LOG/det_full.log" 2>&1
    rc=$?
    echo "=== det_full attempt $tries exit=$rc $(date +%H:%M:%S)" \
      | tee -a "$LOG/status"
    grep -q '"iteration": 24000' work_dirs/r5_det_full/eval_metrics.json \
      2>/dev/null && { echo "det_full DONE" | tee -a "$LOG/status"; exit 0; }
    wait_device
  done
  echo "det_full exhausted retries" | tee -a "$LOG/status"
  exit 2
fi

# decomp already recorded (RESULTS.md §9a, logs/r5_device/decomp_bs2*.log);
# re-run only on request
if [ "${DECOMP:-0}" = "1" ]; then
  run decomp 3600 env ST23_DECOMP=1 ST23_DECOMP_BS=2 ST23_STEPS=12 \
    python bench_stage23.py
fi
run stage23 7200 python bench_stage23.py
# vmap-scaling A/B (VERDICT r4 Weak #4): flat custom_vmap lowering vs the
# default batched gather/scatter, same session, same config
run ab_batchsize_flat 3600 env DVT_FLAT_VMAP=1 python tools/ab_batchsize.py 1 2 4
run ab_batchsize_default 3600 env DVT_FLAT_VMAP=0 python tools/ab_batchsize.py 1 2 4
run bench 2400 python bench.py

# short gauge: det step time this session (drives the DET_FULL go/no-go)
run det_gauge 1800 python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 60 --eval_interval 60 \
  --ckpt_interval 0 --batch_size 2 --max_val_images 2 --num_workers 2 \
  --work_dir work_dirs/r5_det_gauge

# windowed-attention detection: the >=1k-iter learning run (r4 smoke was
# 20 iters); same tiny-probe shape as the r4 smoke but 1k iterations
run det_window 10800 python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 1000 --eval_interval 250 \
  --ckpt_interval 250 --auto_resume --batch_size 2 --max_val_images 8 \
  --num_workers 2 --det_window_size 7 --det_add_pe --det_proposals 50 \
  --det_roi_sample 32 --work_dir work_dirs/r5_det_window

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG/status"
