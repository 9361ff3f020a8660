"""Drive the convergence benchmark (tests/test_convergence.py) on the
REAL chip — same code, same thresholds, chip-measured margins.

    PYTHONPATH=tests python scripts/run_convergence_tpu.py [workdir]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT))


def main():
    import jax

    from pistoseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import test_convergence as tc

    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="pistoseg_convergence_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"[convergence] backend={jax.default_backend()} workdir={work}")

    # corpus (mirror of the pytest fixture)
    tc.make_mosaics(work / "mosaic", 64)
    tc.make_big_eval(work / "valid", 2)
    train, gt = work / "train", work / "gt"
    names = tc.make_labeled_patches(train, gt, 48)
    tc.corrupt_artifacts(train, gt, work / "pmask", work / "cam")
    tc.corrupted_mask_pngs(work / "pmask", work / "corrupted_masks", train)
    from pistoseg_tpu.stages.stage1_split import split_images

    split_images(tc._cfg(), str(work / "valid"), str(work / "val_patches"),
                 patch_size=tc.SIZE, stride=tc.SIZE // 2)
    # quick stage-0 classifier: stage 4's backbone warm start (mirror of
    # the pytest fixture)
    from pistoseg_tpu.stages.stage0_cam import train_stage0

    r0 = train_stage0(tc._cfg(), str(train), log_dir=str(work / "logs/s0"))
    corpus = {"root": work, "train": train, "gt": gt, "names": names,
              "s0_ckpt": r0["checkpoint_dir"]}

    t0 = time.monotonic()
    results = {}
    for name in ("test_stage2_converges",
                 "test_stage4_rfm_improves_corrupted_masks",
                 "test_stage5_refined_beats_corrupted"):
        t = time.monotonic()
        try:
            getattr(tc, name)(corpus)
            results[name] = "PASS"
        except AssertionError as e:
            results[name] = f"FAIL: {e}"
        results[name + "_s"] = round(time.monotonic() - t, 1)
        print(f"[convergence] {name}: {results[name]}", flush=True)
    results["wall_s"] = round(time.monotonic() - t0, 1)
    results["margins"] = tc.RESULTS
    results["backend"] = jax.default_backend()
    (work / "results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
