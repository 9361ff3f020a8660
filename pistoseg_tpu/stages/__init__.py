"""Stage entry points (the public CLI surface mirroring the reference's
scripts): stage0 CAM train/export, stage1 synthesis/splitting,
stage2 mosaic train, stage3 pseudo-mask inference, stage4 revise
train/infer, stage5 segmentation train/test.  Run as
``python -m pistoseg_tpu.stages.<stage> --flag=value ...``."""
