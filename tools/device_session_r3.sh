#!/bin/bash
# Round-3 serialized device measurement session.
#
# The tunnel TPU wedges for 30+ min after faults and only one process may
# touch it at a time, so this script (a) polls until the device answers,
# (b) runs every pending round-3 measurement back to back with a health
# probe between steps, logging to /tmp/r3_device/. Steps:
#   1. tools/flash_equiv_check.py  - compiled flash-vs-SDPA fwd+grads
#   2. tools/ab_segval.py          - batched vs per-window seg val sweep
#   3. bench_stage23.py            - stage-2/3 step-time grid
#   4. make_video_demo.py          - full reference 490x854 stride-4 clip
#   5. bench.py                    - stage-1 headline (extract_bsz=128)
set -u
LOG=/tmp/r3_device
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
    echo "device wedged after $name; stopping" | tee -a "$LOG/status"
    exit 2
  fi
}

run flash_equiv 1800 python tools/flash_equiv_check.py
run ab_segval 2700 python tools/ab_segval.py
run bench_stage23 3600 python bench_stage23.py

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

# bench-default candidate: pixel_bsz 1024 measured 0.96 ms/iter in round 2
# (vs 1.39 tuned) but was shelved on a 2-image quality dip; the N=34 seed
#-floor methodology can now judge it properly on a 14-image subset.
QS_TUNED_JSON='{"stochastic_corners": true, "table_sweep_every": 16, "n_levels": 12, "level_sample": 4, "pixel_bsz": 1024}' \
QS_N_DAVIS=6 QS_N_SYNTH=6 \
run candidate_pb1024 7200 python tools/quality_sweep.py \
  --out /tmp/quality_sweep_pb1024.jsonl

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG/status"
