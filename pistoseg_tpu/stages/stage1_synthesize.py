"""Stage 1: mosaic dataset synthesis CLI.

CLI over :class:`pistoseg_tpu.data.mosaic.MosaicSynthesizer`
(rebuilds ``create_dataset.ipynb`` / ``create_dataset_bcss.ipynb``):
optional one-time background-mask extraction, then a sharded parallel
write of ``num_images`` mosaics with exact masks.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

from pistoseg_tpu.core.config import Config
from pistoseg_tpu.data.mosaic import MosaicSynthesizer, write_background_masks
from pistoseg_tpu.stages.common import parse_cli


def synthesize(
    cfg: Config,
    train_data: str,
    out_dir: str,
    background_dir: Optional[str] = None,
    num_images: Optional[int] = None,
    num_workers: Optional[int] = None,
) -> Dict:
    profile = cfg.profile
    sc = cfg.synth
    if profile.has_background_channel:
        bg_dir = Path(background_dir) if background_dir else Path(train_data) / "background-mask"
        if not bg_dir.exists():
            n = write_background_masks(train_data, bg_dir)
            print(f"wrote {n} background masks to {bg_dir}")
    else:
        bg_dir = None
    synth = MosaicSynthesizer(
        train_data, profile,
        background_dir=bg_dir,
        bg_reject_frac=sc.bg_reject_frac,
        aug_prob=sc.aug_prob,
        seed=sc.seed,
    )
    n = num_images if num_images is not None else sc.num_images
    synth.write_dataset(out_dir, n, num_workers or sc.num_workers)
    return {"images": n, "out_dir": str(out_dir), "grid": profile.mosaic_grid}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return synthesize(
        cfg,
        train_data=extras["train_data"],
        out_dir=extras["out_dir"],
        background_dir=extras.get("background_dir"),
        num_images=int(extras["num_images"]) if "num_images" in extras else None,
        num_workers=int(extras["num_workers"]) if "num_workers" in extras else None,
    )


if __name__ == "__main__":
    main()
