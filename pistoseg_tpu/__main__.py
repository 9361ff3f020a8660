"""Unified CLI: ``python -m pistoseg_tpu <stage> --key=value ...``.

One entry point over the per-stage modules (which remain directly
runnable), replacing the reference's loose collection of scripts with a
discoverable surface.
"""

from __future__ import annotations

import sys

_STAGES = {
    "stage0-train": ("pistoseg_tpu.stages.stage0_cam", "OEEM classifier training"),
    "stage0-export": ("pistoseg_tpu.stages.stage0_export_cam", "export 32×32 training CAMs"),
    "stage1-synthesize": ("pistoseg_tpu.stages.stage1_synthesize", "mosaic dataset synthesis"),
    "stage1-split": ("pistoseg_tpu.stages.stage1_split", "cut val/test WSIs into patch grids"),
    "stage2-train": ("pistoseg_tpu.stages.stage2_mosaic", "preliminary segmentation training"),
    "stage3-infer": ("pistoseg_tpu.stages.stage3_infer_pmask", "pseudo-mask inference"),
    "stage4-train": ("pistoseg_tpu.stages.stage4_revise", "RFM revision training"),
    "stage4-infer": ("pistoseg_tpu.stages.stage4b_infer_revise", "refined mask emission"),
    "stage5-train": ("pistoseg_tpu.stages.stage5_train", "precise segmentation training"),
    "stage5-test": ("pistoseg_tpu.stages.stage5_test", "final evaluation + mask emission"),
}


def main() -> int:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("usage: python -m pistoseg_tpu <stage> --key=value ...\n")
        print("stages:")
        for name, (_, desc) in _STAGES.items():
            print(f"  {name:20s} {desc}")
        print("\nconfig overrides use dotted keys, e.g. --mosaic.lr=1e-3 "
              "--dataset=bcss; stage paths are plain flags, e.g. "
              "--train_data=...  (see README.md)")
        print("common stage flags: --pretrained=<weights.pth> (ImageNet "
              "init, stages 0/2/4/5), --trust_inputs=true (accept "
              "un-manifested upstream artifacts), --resume=true, "
              "--<stage>.checkpoint_every_steps=N (mid-epoch snapshots)")
        return 0
    stage = argv[0]
    if stage not in _STAGES:
        print(f"unknown stage '{stage}' (have: {', '.join(_STAGES)})", file=sys.stderr)
        return 2
    module, _ = _STAGES[stage]
    import importlib

    mod = importlib.import_module(module)
    mod.main(argv[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
