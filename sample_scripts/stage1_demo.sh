#!/bin/bash
# Single-image stage-1 demo over several backbones (reference stage1_demo.sh):
# fits the per-image decomposition on one image and writes the PCA panel.

img=${1:-"demo/cat.jpg"}

for model in \
    vit_base_patch14_dinov2.lvd142m \
    vit_base_patch14_reg4_dinov2.lvd142m \
    vit_base_patch16_224.dino \
    vit_base_patch16_224.mae \
    deit3_base_patch16_224.fb_in1k \
    vit_base_patch16_clip_384.laion2b_ft_in12k_in1k \
    eva02_base_patch16_clip_224.merged2b \
    vit_base_patch16_384.augreg_in21k_ft_in1k; do
  python main_img_denoising.py \
      --model "$model" \
      --img_path "$img" \
      --images_per_batch 1 \
      --output_dir "./work_dirs/demo/$model"
done
