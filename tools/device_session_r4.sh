#!/bin/bash
# Round-4 serialized device measurement session.
#
# Waits for a healthy tunnel chip, then runs every pending round-4
# measurement back to back with health probes between steps, logging to
# /tmp/r4_device/. Only one process may touch the TPU at a time, and host
# CPU contention starves the tunnel, so nothing else should run during
# this session. Steps (VERDICT r3 next-round list):
#   1. tools/flash_equiv_check.py  - compiled flash-vs-SDPA fwd+grads  (#2)
#   2. tools/ab_segval.py          - batched vs per-window seg val     (#2)
#   3. bench_stage23.py            - stage-2/3 step grid incl. the new
#                                    stride-7/4 flash-vs-einsum arms (#1,#9)
#   4. tools/ab_overlap.py         - stage-2 loader/step overlap A/B:
#                                    include_image=False vs reference     (#1)
#   5. make_video_demo.py          - full reference 490x854 stride-4 clip (#2)
#   6. bench.py                    - stage-1 headline + utilization     (#6)
#   7. quality_sweep pixel_bsz1024 - stranded r3 candidate arm          (#2)
# The full-recipe detection run (#7) is long; run it separately via
# DET_FULL=1 bash tools/device_session_r4.sh (skips the rest).
set -u
LOG=/tmp/r4_device
mkdir -p "$LOG"
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

probe() {
  timeout 90 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))" \
    >/dev/null 2>&1
}

n=0
until probe; do
  n=$((n + 1))
  if [ "$n" -ge "${MAX_PROBES:-90}" ]; then
    echo "device never came back ($n probes)" | tee -a "$LOG/status"
    exit 1
  fi
  sleep 120
done
echo "device up after $n wait-probes ($(date +%H:%M:%S))" | tee -a "$LOG/status"

run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$LOG/status"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG/status"
  if ! probe; then
    echo "device wedged after $name; waiting before next step" \
      | tee -a "$LOG/status"
    m=0
    until probe; do
      m=$((m + 1))
      [ "$m" -ge 30 ] && { echo "gave up re-probing" | tee -a "$LOG/status"; exit 2; }
      sleep 120
    done
    echo "device back after $m probes" | tee -a "$LOG/status"
  fi
}

if [ "${DET_FULL:-0}" = "1" ]; then
  # full-recipe detection run (24k iters, synthetic VOC, watchdog-chunked
  # inside the CLI): VERDICT r3 #7
  run det_full 28800 python evaluate_dense_tasks.py voc_det \
    --data_root /tmp/dvt_synth/voc --eval_interval 2000 \
    --batch_size 2 --max_val_images 8 --num_workers 2 \
    --work_dir /tmp/r4_det_full
  echo "DET_FULL DONE $(date +%H:%M:%S)" | tee -a "$LOG/status"
  exit 0
fi

run flash_equiv 1800 python tools/flash_equiv_check.py
run ab_segval 2700 python tools/ab_segval.py
run bench_stage23 5400 python bench_stage23.py
run ab_overlap 2700 python tools/ab_overlap.py

mkdir -p /tmp/clip490
i=0
for f in /root/reference/demo/davis-mallard-water/*.jpg; do
  cp "$f" /tmp/clip490/
  i=$((i + 1))
  [ "$i" -ge 6 ] && break
done
run video_demo 5400 python make_video_demo.py --frames_dir /tmp/clip490 \
  --stride_size 4 --input_size 490 854 --output_dir /tmp/video490 \
  --stats_frames 4 --stats_path /root/reference/demo/assets/stats.pth
run bench 2400 python bench.py

QS_TUNED_JSON='{"stochastic_corners": true, "table_sweep_every": 16, "n_levels": 12, "level_sample": 4, "pixel_bsz": 1024}' \
QS_N_DAVIS=6 QS_N_SYNTH=6 \
run candidate_pb1024 7200 python tools/quality_sweep.py \
  --out /tmp/quality_sweep_pb1024.jsonl

# windowed-attention detection smoke on device (VERDICT r3 #3 done-criterion)
run det_window_smoke 1800 python evaluate_dense_tasks.py voc_det \
  --data_root /tmp/dvt_synth/voc --num_iterations 20 --eval_interval 20 \
  --batch_size 2 --max_val_images 2 --num_workers 2 \
  --det_window_size 7 --det_add_pe --det_proposals 50 --det_roi_sample 32 \
  --work_dir /tmp/r4_det_win_smoke

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG/status"
