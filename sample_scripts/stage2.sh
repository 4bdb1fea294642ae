#!/bin/bash
# Stage 2: train the generalizable denoiser on cached stage-1 features,
# then run the three linear-probe evals.
# (Reference: torchrun --nproc_per_node=8 main_denoiser.py ... ; here one
# process data-parallels over every TPU chip automatically.)

model=${1:-"vit_base_patch14_dinov2.lvd142m"}
data_root=${2:-"data/voc"}
list=${3:-"data/voc/voc_train.txt"}
feat_root=${4:-"data/voc_denoised/denoised_features/$model"}
run_name=${5:-"stage2_$model"}

python main_denoiser.py \
    --model "$model" \
    --data_root "$data_root" \
    --data_list_path "$list" \
    --feat_root "$feat_root" \
    --batch_size 32 \
    --num_iterations 40000 \
    --run_name "$run_name"

ckpt="./work_dirs/denoising-vit/$run_name/checkpoints"

python evaluate_dense_tasks.py voc \
    --model "$model" --denoiser_ckpt "$ckpt" \
    --data_root data/VOCdevkit/VOC2012 \
    --work_dir "./work_dirs/eval/${run_name}_voc"
python evaluate_dense_tasks.py ade20k \
    --model "$model" --denoiser_ckpt "$ckpt" \
    --data_root data/ade/ADEChallengeData2016 \
    --work_dir "./work_dirs/eval/${run_name}_ade"
python evaluate_dense_tasks.py nyu \
    --model "$model" --denoiser_ckpt "$ckpt" \
    --data_root data/nyu \
    --work_dir "./work_dirs/eval/${run_name}_nyu"
