#!/usr/bin/env bash
# End-to-end BCSS-WSSS pipeline (mirror of the reference's run-bcss.sh).
set -euo pipefail

DATA=${DATA:-data/bcss}
LOGS=${LOGS:-logs/bcss}
DS=--dataset=bcss

# Optional ImageNet weights (see README "Pretrained weights")
R38=${PRETRAINED_R38:+--pretrained=$PRETRAINED_R38}
B0=${PRETRAINED_B0:+--pretrained=$PRETRAINED_B0}
B3=${PRETRAINED_B3:+--pretrained=$PRETRAINED_B3}

# val CAM mIoU gates the best checkpoint (OEEM/classification/train.py:151-157)
python -m pistoseg_tpu.stages.stage0_cam $DS \
    --train_data=$DATA/training --log_dir=$LOGS/stage0 \
    --val_images=$DATA/validation/img --val_masks=$DATA/validation/mask \
    ${R38:-}
python -m pistoseg_tpu.stages.stage0_export_cam $DS \
    --train_data=$DATA/training --ckpt_dir=$LOGS/stage0/checkpoints \
    --out_dir=$DATA/CAM/train

python -m pistoseg_tpu.stages.stage1_synthesize $DS \
    --train_data=$DATA/training --out_dir=$DATA/mosaic
python -m pistoseg_tpu.stages.stage1_split $DS \
    --input_root=$DATA/validation --out_dir=$DATA/validation/patches_224_224 \
    --patch_size=224 --stride=224 --scales=1.0
python -m pistoseg_tpu.stages.stage1_split $DS \
    --input_root=$DATA/testing --out_dir=$DATA/testing/patches_224_224 \
    --patch_size=224 --stride=224 --scales=1.0

python -m pistoseg_tpu.stages.stage2_mosaic $DS \
    --mosaic_data=$DATA/mosaic \
    --shard_cache=$DATA/mosaic_shards \
    --val_data=$DATA/validation/patches_224_224 \
    --val_big_root=$DATA/validation \
    --log_dir=$LOGS/stage2 \
    ${B0:-}

python -m pistoseg_tpu.stages.stage3_infer_pmask $DS \
    --train_data=$DATA/training --ckpt_dir=$LOGS/stage2/checkpoints \
    --out_dir=$LOGS/stage2/pseudo

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

python -m pistoseg_tpu.stages.stage5_train $DS \
    --train_data=$DATA/training --mask_dir=$LOGS/stage4/refine/cam \
    --val_data=$DATA/validation/patches_224_224 \
    --val_big_root=$DATA/validation \
    --log_dir=$LOGS/stage5 \
    ${B3:-}
python -m pistoseg_tpu.stages.stage5_test $DS \
    --test_data=$DATA/testing/patches_224_224 \
    --big_root=$DATA/testing \
    --ckpt_dir=$LOGS/stage5/checkpoints \
    --save_dir=$LOGS/stage5/test
