"""TPU run-to-run bit-determinism probe (VERDICT r4 #4, BASELINE.md:27-28).

Runs the SAME inference/export computations twice in two fresh processes
on the real chip and compares artifact bytes:

* stage-0b CAM export over K training patches (multiscale windows →
  canvas → ensemble → [C,32,32] f32 .npy) — the path BASELINE.md's
  "bit-reproducible deterministic interpolation" promise is about,
* stage-3 pseudo-mask inference (d4 TTA, palette PNG + f32 logits).

Two *separate processes* (not two loops in one) so nothing can alias:
fresh TPU client, fresh compilation, fresh uploads each time.

    python scripts/probe_tpu_determinism.py <workdir-with-training+ckpts> [K]

Exits 0 with "DETERMINISTIC" iff every artifact is byte-identical.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import subprocess
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def tree_digests(root: Path) -> dict:
    out = {}
    for p in sorted(root.rglob("*")):
        if p.is_file() and p.name != "manifest.json":
            out[str(p.relative_to(root))] = hashlib.sha256(
                p.read_bytes()).hexdigest()
    return out


def run_once(work: Path, tag: str, k: int) -> dict:
    """Child mode: export K CAMs + stage-3 over K images into <work>/det_<tag>."""
    from pistoseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, str(_ROOT / "scripts"))
    import run_full_budget as rfb

    cfg = rfb.build_cfg(1.0)
    out = work / f"det_{tag}"
    shutil.rmtree(out, ignore_errors=True)

    from pistoseg_tpu.stages.stage0_export_cam import export_cams

    export_cams(cfg, str(work / "training"),
                str(work / "logs" / "stage0" / "checkpoints"),
                str(out / "cam"), limit=k)

    s2_ckpt = work / "logs" / "stage2" / "checkpoints"
    if s2_ckpt.exists():
        import copy

        from pistoseg_tpu.stages.stage3_infer_pmask import infer_stage3

        cfg3 = copy.deepcopy(cfg)
        cfg3.infer.batch_size = 16
        # stage-3 over a K-image subset: copy the first K patches
        sub = out / "train_subset"
        sub.mkdir(parents=True)
        for p in sorted((work / "training").glob("*.png"))[:k]:
            shutil.copy2(p, sub / p.name)
        infer_stage3(cfg3, str(sub), str(s2_ckpt), str(out / "pseudo"))
    return tree_digests(out)


def main():
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/tmp/pistoseg_full_budget")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if "--child" in sys.argv:
        tag = sys.argv[sys.argv.index("--child") + 1]
        d = run_once(work, tag, k)
        (work / f"det_{tag}.digests.json").write_text(json.dumps(d, indent=0))
        return

    for tag in ("a", "b"):
        rc = subprocess.call(
            [sys.executable, str(Path(__file__).resolve()), str(work), str(k),
             "--child", tag])
        if rc != 0:
            raise SystemExit(f"child {tag} failed ({rc})")
    da = json.loads((work / "det_a.digests.json").read_text())
    db = json.loads((work / "det_b.digests.json").read_text())
    if set(da) != set(db):
        print("FILE SETS DIFFER:", set(da) ^ set(db))
        raise SystemExit(1)
    diff = [f for f in da if da[f] != db[f]]
    report = {"n_artifacts": len(da), "n_diverging": len(diff),
              "diverging": diff[:20]}
    print(json.dumps(report, indent=2))
    if diff:
        print("NON-DETERMINISTIC")
        raise SystemExit(1)
    print(f"DETERMINISTIC: {len(da)} artifacts byte-identical across two "
          "fresh-process TPU runs")


if __name__ == "__main__":
    main()
