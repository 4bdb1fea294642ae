#!/usr/bin/env bash
# Unblock-day readiness kit: the single command sequence to run the moment
# this repo lands on a host WITH network + timm + real datasets/weights.
# Every blocked claim of RESULTS.md resolves through these stages:
#
#   1. golden timm fixtures for all 8 backbone families (+ stride override)
#   2. tests/test_golden.py  (>=0.999-cosine parity vs real timm weights)
#   3. released-DVT-checkpoint conversion round-trip
#   4. real VOC quality loop: stage-1 dumps (>=100 images) -> cosine vs the
#      reference's published .npy features (if provided) -> stage 2 ->
#      linear-probe mIoU delta vs BASELINE.md
#
# Offline dry-run (this sandbox): DRY_RUN=1 bash tools/unblock_day.sh
# replays every step that can run without network/data — synthetic VOC
# stands in for the real one, random-weight backbones for timm — proving
# the command plumbing end to end. Real run knobs:
#   VOC_ROOT=/data/VOCdevkit/VOC2012   (real VOC2012 layout)
#   DVT_CKPT=/ckpts/dinov2_b_denoiser.pth  (released stage-2 checkpoint,
#       reference README.md:153-161)
#   REF_FEATS=/data/dvt_reference_feats  (optional: the reference repo's
#       own stage-1 .npy dumps for direct cosine comparison)
set -euo pipefail
cd "$(dirname "$0")/.."

DRY_RUN="${DRY_RUN:-0}"
if [ "$DRY_RUN" = "1" ]; then
  # the offline replay must run with the TPU absent/wedged - force the
  # host backend (the axon plugin ignores JAX_PLATFORMS; every CLI
  # honors DVT_PLATFORM)
  export DVT_PLATFORM="${DVT_PLATFORM:-cpu}"
fi
WORK="${WORK:-/tmp/unblock_day}"
MODEL="${MODEL:-vit_base_patch14_dinov2.lvd142m}"
N_IMAGES="${N_IMAGES:-100}"
mkdir -p "$WORK"

log() { echo "=== [$(date +%H:%M:%S)] $*"; }

# ---------- stage 1: golden fixtures ----------
if [ "$DRY_RUN" = "1" ]; then
  log "DRY: golden fixtures need timm — verifying the dumper parses + the"
  log "     case list covers every zoo family instead"
  python - <<'EOF'
import ast, sys
src = open("tools/dump_reference_features.py").read()
ast.parse(src)  # syntax-checks the tool
import re
cases = re.findall(r'\("([\w./]+)", (\d+), (\d+)\)', src)
assert len(cases) >= 9, cases
from dvt_tpu.models.zoo import MODEL_LIST
known = {c[0] for c in cases}
missing = [m for m in known if m not in MODEL_LIST]
assert not missing, f"dump cases not in zoo: {missing}"
print(f"ok: {len(cases)} golden cases, all registered in the zoo")
EOF
else
  log "dumping golden fixtures (timm) for all families + stride override"
  # any real photo works (fixtures save their own pixels); default to the
  # sandbox's demo image when present, override with GOLDEN_IMAGE
  GOLDEN_IMAGE="${GOLDEN_IMAGE:-/root/reference/demo/cat.jpg}"
  [ -f "$GOLDEN_IMAGE" ] || { echo "set GOLDEN_IMAGE=<some .jpg>"; exit 1; }
  python tools/dump_reference_features.py \
    --image "$GOLDEN_IMAGE" --out tests/golden
fi

# ---------- stage 2: golden parity tests ----------
if [ "$DRY_RUN" = "1" ]; then
  log "DRY: running test_golden.py (will skip without fixtures) + the"
  log "     torch-oracle ViT parity tests that stand in for it offline"
  python -m pytest tests/test_golden.py tests/test_vit.py -q --no-header | tail -2
else
  log "golden parity: our ViT vs timm at >=0.999 cosine"
  python -m pytest tests/test_golden.py -q
fi

# ---------- stage 3: released checkpoint conversion ----------
if [ "$DRY_RUN" = "1" ]; then
  log "DRY: converter round-trip on a synthetic stage-2 state dict"
  python -m pytest tests/test_convert.py -q --no-header | tail -2
else
  : "${DVT_CKPT:?set DVT_CKPT to a released DVT .pth (README.md:153-161)}"
  log "converting released checkpoint $DVT_CKPT"
  python - "$DVT_CKPT" <<'EOF'
import sys
from main_distillation import load_denoiser_params
p = load_denoiser_params(sys.argv[1])
import jax
print("converted leaves:", len(jax.tree.leaves(p)))
EOF
fi

# ---------- stage 4: VOC quality loop ----------
if [ "$DRY_RUN" = "1" ]; then
  VOC_ROOT="$WORK/synth/voc"
  [ -d "$VOC_ROOT" ] || python tools/make_synthetic_data.py \
      --out "$WORK/synth" --n_train 8 --n_val 4
  S1_ARGS=(--num_views 32 --num_iters 160 --warmup_iters 16)
  EV_ARGS=(--num_iterations 20 --eval_interval 20 --batch_size 2
           --max_val_images 2 --num_workers 2)
  S2_ARGS=(--num_iterations 20 --batch_size 4)
else
  : "${VOC_ROOT:?set VOC_ROOT to the real VOC2012 root}"
  S1_ARGS=()
  EV_ARGS=()
  S2_ARGS=(--num_iterations 40000 --batch_size 32)
fi

log "stage-1 dumps over $N_IMAGES VOC images"
if [ -f "$VOC_ROOT/voc_train.txt" ]; then
  head -n "$N_IMAGES" "$VOC_ROOT/voc_train.txt" > "$WORK/img_list.txt"
else
  # capture ls fully before head: under pipefail, head closing the pipe
  # early makes ls exit 141 (SIGPIPE) and set -e kills the script on any
  # real-size VOC tree
  all_imgs=$(ls "$VOC_ROOT/JPEGImages")
  printf '%s\n' "$all_imgs" | head -n "$N_IMAGES" \
    | sed 's#^#JPEGImages/#' > "$WORK/img_list.txt"
fi
# --output_dir keeps stage-1 visualizations under $WORK (the default
# ./work_dirs/demo is the in-tree demo output; a rehearsal must not
# overwrite it)
python main_img_denoising.py --model "$MODEL" \
  --img_path "$WORK/img_list.txt" --data_root "$VOC_ROOT" \
  --save_root "$WORK/feats" --num_imgs "$N_IMAGES" \
  --output_dir "$WORK/s1_vis" "${S1_ARGS[@]}"

if [ -n "${REF_FEATS:-}" ]; then
  log "cosine vs the reference's published stage-1 .npy dumps"
  python - "$WORK/feats" "$REF_FEATS" <<'EOF'
import glob, os, sys
import numpy as np
ours_root, ref_root = sys.argv[1], sys.argv[2]
cos_all = []
for ours in glob.glob(os.path.join(ours_root, "denoised_features", "**", "*.npy"), recursive=True):
    rel = os.path.relpath(ours, ours_root)
    ref = os.path.join(ref_root, rel)
    if not os.path.exists(ref):
        continue
    a = np.load(ours)
    a = a.reshape(-1, a.shape[-1])
    b = np.load(ref).reshape(-1, a.shape[-1])
    c = np.sum(a*b, -1) / (np.linalg.norm(a, axis=-1)
                           * np.linalg.norm(b, axis=-1) + 1e-8)
    cos_all.append(c)
if not cos_all:
    print("n=0 overlapping feature maps between ours and REF_FEATS - "
          "check the dump tree layout (denoised_features/<model>/...)")
else:
    c = np.concatenate(cos_all)
    print(f"n={len(cos_all)} maps, cosine mean {c.mean():.4f} "
          f"p5 {np.percentile(c,5):.4f}")
EOF
fi

log "stage-2 denoiser on the dumps"
# feat_root must point INSIDE the stage-1 layout at
# denoised_features/<model> (PairedListDataset joins it with the
# image-relative path), and the data list is required
python main_denoiser.py --model "$MODEL" --data_root "$VOC_ROOT" \
  --data_list_path "$WORK/img_list.txt" \
  --feat_root "$WORK/feats/denoised_features/$MODEL" \
  --output_root "$WORK/s2" \
  --run_name unblock "${S2_ARGS[@]}"

log "probe mIoU: raw vs +denoiser (delta vs BASELINE.md table)"
CKPT="$WORK/s2/denoising-vit/unblock/checkpoints"
python evaluate_dense_tasks.py voc --model "$MODEL" \
  --data_root "$VOC_ROOT" --work_dir "$WORK/eval_raw" "${EV_ARGS[@]}"
python evaluate_dense_tasks.py voc --model "$MODEL" \
  --data_root "$VOC_ROOT" --denoiser_ckpt "$CKPT" \
  --work_dir "$WORK/eval_denoised" "${EV_ARGS[@]}"
log "compare $WORK/eval_raw/eval_metrics.json vs eval_denoised/ vs BASELINE.md"
python dvt_tpu/eval/collect_results.py "$WORK" || true
log "done"
