#!/bin/bash
# Stage 3: distill the denoised representation into the backbone.

model=${1:-"vit_base_patch14_dinov2.lvd142m"}
denoiser_ckpt=${2:-"./work_dirs/denoising-vit/stage2_$model/checkpoints"}
data_root=${3:-"data/imagenet/train"}
run_name=${4:-"stage3_$model"}

python main_distillation.py \
    --model "$model" \
    --denoiser_ckpt "$denoiser_ckpt" \
    --data_root "$data_root" \
    --batch_size 32 \
    --num_epochs 1 \
    --grad_checkpointing \
    --run_name "$run_name"
