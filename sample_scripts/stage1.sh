#!/bin/bash
# Stage 1 at scale: denoise a 10k-image list.
#
# The reference fans one process per GPU over slices of the list
# (its stage1.sh uses CUDA_VISIBLE_DEVICES + start_idx arithmetic).
# On TPU one process drives all chips: the engine runs one fit per chip
# (the measured throughput optimum, RESULTS.md 9d) and shards the image
# batch over the mesh; --images_per_batch can vmap N fits per chip at a
# ~6%/image cost to amortize dispatches; multi-host pods shard the list
# with --start_idx/--num_imgs per host.

model=${1:-"vit_base_patch14_dinov2.lvd142m"}
data_root=${2:-"data/voc"}
list=${3:-"data/voc/voc_train.txt"}
save_root=${4:-"data/voc_denoised"}

python main_img_denoising.py \
    --model "$model" \
    --img_path "$list" \
    --data_root "$data_root" \
    --save_root "$save_root" \
    --num_imgs 100000 \
    --output_dir ./work_dirs/stage1
