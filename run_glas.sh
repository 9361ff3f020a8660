#!/usr/bin/env bash
# GlaS classification-stage pipeline (the reference vendors OEEM's
# classification stage with a GlaS profile, OEEM/classification/
# configuration_glas.yml; its run.sh never drives it — this runner mirrors
# OEEM/README.md steps 5-6 for the GlaS dataset).
#
# Expects:
#   $DATA/training               — patches named {slide}_{idx}-{label}.png
#   $DATA/validation/{img,mask}  — labeled validation images
set -euo pipefail

DATA=${DATA:-data/glas}
LOGS=${LOGS:-logs/glas}
DS=--dataset=glas

R38=${PRETRAINED_R38:+--pretrained=$PRETRAINED_R38}

# classifier training with val-CAM-mIoU best-checkpoint gating
python -m pistoseg_tpu.stages.stage0_cam $DS \
    --train_data=$DATA/training --log_dir=$LOGS/stage0 \
    --val_images=$DATA/validation/img --val_masks=$DATA/validation/mask \
    ${R38:-}

# multiscale sliding-window CAM export (GlaS: 5 scales, stride 56,
# its own normalization stats — DATASET_PROFILES['glas'])
python -m pistoseg_tpu.stages.stage0_export_cam $DS \
    --train_data=$DATA/training --ckpt_dir=$LOGS/stage0/checkpoints \
    --out_dir=$DATA/CAM/train
