#!/usr/bin/env bash
# End-to-end WSSS4LUAD pipeline (mirror of the reference's run.sh staging).
# Expects the WSSS4LUAD release laid out as:
#   $DATA/training                 — image-level-labeled patches
#   $DATA/validation/{img,mask}    — big validation images + masks
#   $DATA/testing/{img,mask}       — big test images + masks
#
# Optional ImageNet weights (reference: smp encoder_weights='imagenet',
# OEEM res38d.pth — see README "Pretrained weights"):
#   PRETRAINED_R38=weights/res38d.pth   → stages 0 + 4 backbone init
#   PRETRAINED_B0=weights/b0.pth        → stage 2 encoder init
#   PRETRAINED_B3=weights/b3.pth        → stage 5 encoder init
set -euo pipefail

DATA=${DATA:-data/wsss4luad}
LOGS=${LOGS:-logs/wsss4luad}
DS=--dataset=wsss4luad

R38=${PRETRAINED_R38:+--pretrained=$PRETRAINED_R38}
B0=${PRETRAINED_B0:+--pretrained=$PRETRAINED_B0}
B3=${PRETRAINED_B3:+--pretrained=$PRETRAINED_B3}

# ---- stage 0: OEEM classifier + training CAMs
# val CAM mIoU gates the best checkpoint (OEEM/classification/train.py:151-157)
python -m pistoseg_tpu.stages.stage0_cam $DS \
    --train_data=$DATA/training --log_dir=$LOGS/stage0 \
    --val_images=$DATA/validation/img --val_masks=$DATA/validation/mask \
    --shard_cache=$LOGS/stage0_shards \
    ${R38:-}
python -m pistoseg_tpu.stages.stage0_export_cam $DS \
    --train_data=$DATA/training --ckpt_dir=$LOGS/stage0/checkpoints \
    --out_dir=$DATA/CAM/train

# ---- stage 1: mosaic synthesis + val/test patch grids
python -m pistoseg_tpu.stages.stage1_synthesize $DS \
    --train_data=$DATA/training --out_dir=$DATA/mosaic
# dual validation splits (split_validation.ipynb cells 5-9):
# 224/56 single-scale and 224/112 5-scale
python -m pistoseg_tpu.stages.stage1_split $DS \
    --input_root=$DATA/validation --out_dir=$DATA/validation/patches_224_56 \
    --patch_size=224 --stride=56 --scales=1.0
python -m pistoseg_tpu.stages.stage1_split $DS \
    --input_root=$DATA/validation --out_dir=$DATA/validation/patches_224_112 \
    --patch_size=224 --stride=112 --scales=1.0,1.25,1.5,1.75,2.0
python -m pistoseg_tpu.stages.stage1_split $DS \
    --input_root=$DATA/testing --out_dir=$DATA/testing/patches_224_112 \
    --patch_size=224 --stride=112 --scales=1.0,1.25,1.5,1.75,2.0

# ---- stage 2: preliminary segmentation on mosaics
# val split: 224/112 5-scale (reference run.sh:43 --val-data=.../patches_224_112)
# shard_cache: pre-decoded native array shards for the hot train loop
python -m pistoseg_tpu.stages.stage2_mosaic $DS \
    --mosaic_data=$DATA/mosaic \
    --shard_cache=$DATA/mosaic_shards \
    --val_data=$DATA/validation/patches_224_112 \
    --val_big_root=$DATA/validation \
    --log_dir=$LOGS/stage2 \
    ${B0:-}

# ---- stage 3: pseudo-mask inference over real training patches
python -m pistoseg_tpu.stages.stage3_infer_pmask $DS \
    --train_data=$DATA/training --ckpt_dir=$LOGS/stage2/checkpoints \
    --out_dir=$LOGS/stage2/pseudo

# ---- stage 4: RFM revision + refined mask emission
python -m pistoseg_tpu.stages.stage4_revise $DS \
    --train_data=$DATA/training \
    --pmask_dir=$LOGS/stage2/pseudo/logits_32x32 \
    --cam_dir=$DATA/CAM/train \
    --log_dir=$LOGS/stage4 \
    ${R38:-}
python -m pistoseg_tpu.stages.stage4b_infer_revise $DS \
    --train_data=$DATA/training \
    --pmask_dir=$LOGS/stage2/pseudo/logits_32x32 \
    --cam_dir=$DATA/CAM/train \
    --ckpt_dir=$LOGS/stage4/checkpoints \
    --out_dir=$LOGS/stage4/refine

# ---- stage 5: precise segmentation on refined masks (refine/cam default,
#      run.sh:31) + final test
# val split: 224/56 single-scale (reference run.sh:8,64 VAL_PATCH_PATH)
python -m pistoseg_tpu.stages.stage5_train $DS \
    --train_data=$DATA/training --mask_dir=$LOGS/stage4/refine/cam \
    --val_data=$DATA/validation/patches_224_56 \
    --val_big_root=$DATA/validation \
    --shard_cache=$LOGS/stage5_shards \
    --log_dir=$LOGS/stage5 \
    ${B3:-}
python -m pistoseg_tpu.stages.stage5_test $DS \
    --test_data=$DATA/testing/patches_224_112 \
    --big_root=$DATA/testing \
    --ckpt_dir=$LOGS/stage5/checkpoints \
    --save_dir=$LOGS/stage5/test
