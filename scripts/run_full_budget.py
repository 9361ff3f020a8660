"""Execute the FULL WSSS4LUAD pipeline at the reference's budgets on the
real chip — the measurement that validates (or refutes) the composed
end-to-end model in ``bench.py::compose_e2e`` (VERDICT r4 #1).

Mirrors ``run_wsss4luad.sh`` stage-for-stage with the production loaders
(shard caches for stages 2/5) over a full-size synthetic dataset shaped
like the challenge release:

* 10,091 single-label 250² training patches (the composed model's
  ``n_train`` and its 90-CAM-windows-per-patch geometry: 4+9+16+25+36
  windows at scales 1.0–2.0, stride 56, crop 224 — run.sh:52),
* 20,000 synthesized 224² mosaics (create_dataset.ipynb cell 11),
* big val/test images cut into the reference's dual patch grids
  (224/56 single-scale + 224/112 five-scale, split_validation.ipynb),
  sized so the test split lands near the composed 5,000-patch budget.

Budgets are the Config defaults == the reference's (stage 0: 20 epochs,
stage 2: 15 × 20,000, stage 4: 25, stage 5: 15; run.sh:15-35).  Batch
sizes are set to the bench's measured-rate shapes (s0 b16, s2 b64, s4
b16, s5 b32, s3 b64 d4-TTA, s4b b16@256², s5-test b256) — the budget is
in images, batching is this implementation's freedom.

Every stage is wall-timed; training stages additionally report the
steady-state ``items_per_sec``/``compile_seconds`` from their epoch logs,
and host RSS is sampled throughout (multi-hour memory stability).  The
result is written to ``perf/full_budget_wsss4luad.json`` (picked up by
``bench.py`` into BENCH extras) with a per-stage comparison against the
composed model: any stage >1.3× over its modeled time is flagged.

Resumable: a fixed workdir + stage manifests (inference/export stages
skip-if-current) + ``resume=True`` training stages (a completed trainer
restores its final state and runs zero epochs).

Usage::

    python scripts/run_full_budget.py [--workdir=/tmp/pistoseg_full_budget]
        [--scale=1.0]
        [--stages=gen,s0_train,s0b_export,s1_prep,s2_train,s3_infer,
                  s4_train,s4b_infer,s5_train,s5_test]
"""

from __future__ import annotations

import copy
import json
import sys
import threading
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

import numpy as np  # noqa: E402

# reference budgets (see bench.py E2E_BUDGET for provenance)
N_TRAIN = 10_091
PATCH_NATIVE = 250          # representative training-patch size (90 windows)
N_VAL_IMAGES = 8            # val split size doesn't enter the e2e model
VAL_SIZE = 500
N_TEST_IMAGES = 6           # ≈5,000 224/112 five-scale test patches
TEST_SIZE = 1000


class RssSampler(threading.Thread):
    def __init__(self, interval: float = 15.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.samples = []
        self._stop = threading.Event()

    @staticmethod
    def _rss_gb() -> float:
        for line in open("/proc/self/status"):
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
        return 0.0

    def run(self):
        while not self._stop.wait(self.interval):
            self.samples.append((time.monotonic(), self._rss_gb()))

    def stop(self):
        self._stop.set()

    def summary(self):
        if not self.samples:
            return {}
        vals = [v for _, v in self.samples]
        return {"rss_gb_max": round(max(vals), 2),
                "rss_gb_final": round(vals[-1], 2),
                "rss_gb_p50": round(sorted(vals)[len(vals) // 2], 2),
                "n_samples": len(vals)}


def gen_dataset(work: Path, scale: float) -> dict:
    """Full-size synthetic WSSS4LUAD-shaped dataset (idempotent)."""
    from PIL import Image

    from pistoseg_tpu.core.config import DATASET_PROFILES
    from pistoseg_tpu.data.labels import format_label
    from pistoseg_tpu.ops.palette import encode_palette_png

    marker = work / "dataset.done.json"
    if marker.exists():
        return json.loads(marker.read_text())
    profile = DATASET_PROFILES["wsss4luad"]
    colors = np.array([[150, 60, 120], [60, 150, 90], [90, 90, 180]], np.uint8)
    n_train = max(4, int(round(N_TRAIN * scale)))

    t0 = time.monotonic()
    train = work / "training"
    train.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(2022)
    for i in range(n_train):
        cls = i % profile.num_classes
        # textured single-class patch: the class color blended a random
        # amount (<0.45, class color stays dominant) toward another class
        # so the task is NOT trivially separable.  With fully-separated
        # colors the BCE saturated to exact 0 within ~10 steps, the logits
        # grew unbounded and the bf16 forward overflowed to NaN by step 30
        # (measured, probe 2026-08-19); an irreducible confusion floor
        # keeps gradients finite over the full 20-epoch budget and is
        # closer to the real task's difficulty anyway.
        other = colors[rng.randint(profile.num_classes)].astype(np.float64)
        alpha = rng.uniform(0.0, 0.45)
        base = (1.0 - alpha) * colors[cls].astype(np.float64) + alpha * other
        tex = rng.randint(-30, 30, (PATCH_NATIVE // 10, PATCH_NATIVE // 10, 3))
        tex = np.kron(tex, np.ones((10, 10, 1)))
        img = np.clip(base[None, None] + tex
                      + rng.randint(-25, 25, (PATCH_NATIVE, PATCH_NATIVE, 3)),
                      0, 200).astype(np.uint8)
        label = [1 if c == cls else 0 for c in range(profile.num_classes)]
        name = f"t{i:05d}-{format_label(label, profile.label_grammar)}.png"
        Image.fromarray(img).save(train / name)

    def big_set(root: Path, n: int, size: int, seed: int):
        (root / "img").mkdir(parents=True, exist_ok=True)
        (root / "mask").mkdir(parents=True, exist_ok=True)
        r = np.random.RandomState(seed)
        for i in range(n):
            small = r.randint(0, profile.num_classes, (size // 50, size // 50))
            mask = np.kron(small, np.ones((50, 50), np.uint8)).astype(np.uint8)
            img = colors[mask].astype(np.int16)
            img += r.randint(-20, 20, img.shape)
            img = np.clip(img, 0, 200).astype(np.uint8)
            mask[:40, :40] = profile.bg_class           # white bg corner
            img[:40, :40] = 255
            Image.fromarray(img).save(root / "img" / f"{i}.png")
            encode_palette_png(mask, profile.palette, root / "mask" / f"{i}.png")

    n_val = max(2, int(round(N_VAL_IMAGES * max(scale, 0.25))))
    n_test = max(2, int(round(N_TEST_IMAGES * max(scale, 0.34))))
    big_set(work / "validation", n_val, VAL_SIZE, 1)
    big_set(work / "testing", n_test, TEST_SIZE, 3)

    info = {"n_train": n_train, "n_val": n_val, "n_test": n_test,
            "gen_s": round(time.monotonic() - t0, 1)}
    marker.write_text(json.dumps(info))
    return info


def steady_state_from_log(log_dir: Path, stage: str) -> dict:
    """Last-epoch items_per_sec + total compile seconds from the trainer's
    event log (epoch rows carry items_per_sec/epoch_seconds/compile_seconds)."""
    p = Path(log_dir) / f"{stage}_events.jsonl"
    out = {}
    if not p.exists():
        return out
    compile_s, ips, val_rows, last_loss = 0.0, [], 0, None
    train_s = 0.0
    for line in p.read_text().splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        if "compile_seconds" in row:
            compile_s += row.get("compile_seconds") or 0.0
        if "epoch_seconds" in row:
            # train-loop wall only (validation/checkpoint excluded by the
            # trainer, loop.py) — stage_wall - train_seconds_total is the
            # stage's validation + loader-warmup + checkpoint share
            train_s += row.get("epoch_seconds") or 0.0
        if "items_per_sec" in row and row.get("items_per_sec"):
            ips.append(row["items_per_sec"])
        if "patch_miou" in row or "cam_miou" in row:
            val_rows += 1
        if "train_loss" in row and row["train_loss"] is not None:
            last_loss = row["train_loss"]
    if ips:
        out["items_per_sec_last"] = round(ips[-1], 1)
        out["items_per_sec_median"] = round(sorted(ips)[len(ips) // 2], 1)
    out["compile_seconds_total"] = round(compile_s, 1)
    if train_s:
        out["train_seconds_total"] = round(train_s, 1)
    if last_loss is not None:
        out["train_loss_last"] = round(last_loss, 4)
        # a diverged trainer poisons every downstream stage — fail the run
        # NOW instead of measuring hours of garbage (stage-0 did exactly
        # this before the lr fix above)
        if not np.isfinite(last_loss):
            raise RuntimeError(
                f"{stage}: train_loss diverged ({last_loss}) — aborting the "
                "full-budget run; fix the stage before re-measuring")
    return out


def main():
    workdir = "/tmp/pistoseg_full_budget"
    scale = 1.0
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--scale="):
            scale = float(a.split("=", 1)[1])
        elif a.startswith("--stages="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            raise SystemExit(f"unknown arg {a}")
    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    out_path = _ROOT / "perf" / "full_budget_wsss4luad.json"
    out_path.parent.mkdir(exist_ok=True)

    import jax

    from pistoseg_tpu.core.cache import enable_compilation_cache
    from pistoseg_tpu.core.config import Config

    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"[full-budget] backend={backend} devices={jax.devices()} "
          f"scale={scale} workdir={work}", flush=True)

    cfg = Config()
    cfg.dataset = "wsss4luad"
    # bench-rate batch shapes (PERF.md round-4 "Our side")
    cfg.cam.batch_size = 16
    # the reference's stage-0 lr (0.01) assumes the pretrained res38d trunk
    # (OEEM classification train.py); from RANDOM init (no published weights
    # in this environment) the frozen-BN WRN38 diverges — measured NaN at
    # step 30 of epoch 0 at scale 1.0.  0.003 is probe-stable; the budget
    # (epochs × images, the quantity the e2e model composes over) is
    # unchanged — lr is not a throughput variable.
    cfg.cam.lr = 0.003
    cfg.mosaic.batch_size = 64
    cfg.seg.batch_size = 32
    if scale != 1.0:
        cfg.cam.epochs = max(1, round(cfg.cam.epochs * scale))
        cfg.mosaic.epochs = max(1, round(cfg.mosaic.epochs * scale))
        cfg.revise.epochs = max(1, round(cfg.revise.epochs * scale))
        cfg.seg.epochs = max(1, round(cfg.seg.epochs * scale))
        cfg.synth.num_images = max(64, int(cfg.synth.num_images * scale))

    sampler = RssSampler()
    sampler.start()
    results: dict = {"backend": backend, "scale": scale,
                     "workdir": str(work), "stage_wall_s": {},
                     "stage_detail": {}, "started": time.strftime("%F %T")}

    def save():
        results["rss"] = sampler.summary()
        out_path.write_text(json.dumps(results, indent=2, sort_keys=True))

    def timed(name, fn):
        if only is not None and name not in only:
            print(f"[full-budget] SKIP {name} (not in --stages)", flush=True)
            return None
        print(f"[full-budget] === {name} ===", flush=True)
        t0 = time.monotonic()
        r = fn()
        dt = time.monotonic() - t0
        results["stage_wall_s"][name] = round(dt, 1)
        if isinstance(r, dict):
            results["stage_detail"].setdefault(name, {}).update(
                {k: v for k, v in r.items()
                 if isinstance(v, (int, float, str, bool))})
        save()
        print(f"[full-budget] === {name} done in {dt:.1f}s ===", flush=True)
        return r

    # ---- data generation (host-side; excluded from the e2e device model
    # on both sides, timed separately here) -------------------------------
    info = timed("gen", lambda: gen_dataset(work, scale))
    if info:
        results["dataset"] = info

    train = str(work / "training")
    valid, test = work / "validation", work / "testing"
    logs = work / "logs"

    from pistoseg_tpu.stages.stage0_cam import train_stage0
    from pistoseg_tpu.stages.stage0_export_cam import export_cams
    from pistoseg_tpu.stages.stage1_split import split_images
    from pistoseg_tpu.stages.stage1_synthesize import synthesize
    from pistoseg_tpu.stages.stage2_mosaic import train_stage2
    from pistoseg_tpu.stages.stage3_infer_pmask import infer_stage3
    from pistoseg_tpu.stages.stage4_revise import train_stage4
    from pistoseg_tpu.stages.stage4b_infer_revise import infer_stage4b
    from pistoseg_tpu.stages.stage5_test import test_stage5
    from pistoseg_tpu.stages.stage5_train import train_stage5

    # ---- stage 0: classifier train (run.sh:44) ---------------------------
    r0 = timed("s0_train", lambda: train_stage0(
        cfg, train, val_images=str(valid / "img"),
        val_masks=str(valid / "mask"), log_dir=str(logs / "stage0"),
        shard_cache=str(work / "stage0_shards"), resume=True))
    if r0:
        results["stage_detail"].setdefault("s0_train", {}).update(
            steady_state_from_log(logs / "stage0", "stage0"))
        save()

    # ---- stage 0b: CAM export (run.sh:52) --------------------------------
    cam_dir = work / "CAM" / "train"
    s0_ckpt = str(logs / "stage0" / "checkpoints")
    timed("s0b_export", lambda: export_cams(cfg, train, s0_ckpt, str(cam_dir)))

    # ---- stage 1: mosaics + patch grids (host-side prep) ----------------
    mosaic = work / "mosaic"

    def s1():
        done = (mosaic / "img").exists() and \
            len(list((mosaic / "img").glob("*.png"))) >= cfg.synth.num_images
        r = ({"images": cfg.synth.num_images, "skipped": True} if done
             else synthesize(cfg, train, str(mosaic)))
        for name, root, ps, st, scl in (
            ("patches_224_56", valid, 224, 56, (1.0,)),
            ("patches_224_112", valid, 224, 112, (1.0, 1.25, 1.5, 1.75, 2.0)),
            ("patches_224_112", test, 224, 112, (1.0, 1.25, 1.5, 1.75, 2.0)),
        ):
            out = root / name
            if not (out / "img").exists() or not any((out / "img").iterdir()):
                sp = split_images(cfg, str(root), str(out), patch_size=ps,
                                  stride=st, scales=scl)
                r[f"{root.name}/{name}"] = sp.get("patches", 0)
        return r

    timed("s1_prep", s1)
    n_test_patches = len(list((test / "patches_224_112" / "img").glob("*.png")))
    results["n_test_patches"] = n_test_patches
    save()

    # ---- stage 2: mosaic segmentation (run.sh:15-17), shard cache -------
    timed("s2_train", lambda: train_stage2(
        cfg, str(mosaic), val_data=str(valid / "patches_224_112"),
        val_big_root=str(valid), log_dir=str(logs / "stage2"),
        shard_cache=str(work / "mosaic_shards"), resume=True))
    results["stage_detail"].setdefault("s2_train", {}).update(
        steady_state_from_log(logs / "stage2", "stage2"))
    save()

    # ---- stage 3: pseudo-mask inference, d4 TTA ---------------------------
    # batch 64 × 8 d4 views = 512-sample effective forward — the largest
    # shape proven to fit v5e HBM (batch 512 × TTA OOMed at 19.7 GB on a
    # bf16[4096,112,112,192] decoder intermediate)
    cfg3 = copy.deepcopy(cfg)
    cfg3.infer.batch_size = 64
    timed("s3_infer", lambda: infer_stage3(
        cfg3, train, str(logs / "stage2" / "checkpoints"),
        str(work / "pseudo")))

    # ---- stage 4: RFM revise train (run.sh:21) ---------------------------
    # warm-start the backbone from the stage-0 classifier (the reference
    # loads the published res38d weights here; absent those files, the
    # in-pipeline classifier is the non-random source — apply_stage0_trunk)
    r4 = timed("s4_train", lambda: train_stage4(
        cfg, train, str(work / "pseudo" / "logits_32x32"), str(cam_dir),
        log_dir=str(logs / "stage4"), resume=True,
        pretrained_stage0=s0_ckpt))
    results["stage_detail"].setdefault("s4_train", {}).update(
        steady_state_from_log(logs / "stage4", "stage4"))
    save()

    # ---- stage 4b: refined-mask inference @256² --------------------------
    timed("s4b_infer", lambda: infer_stage4b(
        cfg, train, str(work / "pseudo" / "logits_32x32"), str(cam_dir),
        str(logs / "stage4" / "checkpoints"), out_dir=str(work / "refine")))

    # ---- stage 5: precise segmentation (run.sh:31), shard cache ---------
    timed("s5_train", lambda: train_stage5(
        cfg, train, str(work / "refine" / "cam"),
        val_data=str(valid / "patches_224_56"), val_big_root=str(valid),
        log_dir=str(logs / "stage5"),
        shard_cache=str(work / "stage5_shards"), resume=True))
    results["stage_detail"].setdefault("s5_train", {}).update(
        steady_state_from_log(logs / "stage5", "stage5"))
    save()

    # ---- stage 5 test (run.sh:33-38) -------------------------------------
    cfg5t = copy.deepcopy(cfg)
    cfg5t.infer.batch_size = 256
    m = timed("s5_test", lambda: test_stage5(
        cfg5t, str(test / "patches_224_112"),
        str(logs / "stage5" / "checkpoints"),
        save_dir=str(logs / "stage5" / "test"), big_root=str(test)))
    if m:
        results["final_metrics"] = {k: round(float(v), 4)
                                    for k, v in m.items()}

    # ---- summary: measured vs the composed model -------------------------
    sampler.stop()
    stage_wall = results["stage_wall_s"]
    pipeline_keys = [k for k in stage_wall if k not in ("gen", "s1_prep")]
    measured_total = sum(stage_wall[k] for k in pipeline_keys)
    summary = {
        "backend": backend,
        "scale": scale,
        "e2e_measured_hours": round(sum(stage_wall.values()) / 3600.0, 3),
        "e2e_device_stages_hours": round(measured_total / 3600.0, 3),
        "host_prep_hours": round(
            sum(stage_wall.get(k, 0) for k in ("gen", "s1_prep")) / 3600.0, 3),
        "stage_wall_s": stage_wall,
    }
    # composed per-stage model (BENCH_r04 rates over these budgets)
    bench_path = _ROOT / "BENCH_r04.json"
    if scale == 1.0 and bench_path.exists():
        model = json.loads(bench_path.read_text())["parsed"]["extras"]["e2e"][
            "ours_stage_s"]
        name_map = {"s0_train": "s0_train", "s0b_export": "s0b_export",
                    "s2_train": "s2_train", "s3_infer": "s3_infer",
                    "s4_train": "s4_train", "s4b_infer": "s4b_infer",
                    "s5_train": "s5_train", "s5_test": "s5_test"}
        ratios, flags = {}, []
        for meas, comp in name_map.items():
            if meas in stage_wall and comp in model and model[comp]:
                r = stage_wall[meas] / model[comp]
                ratios[meas] = round(r, 2)
                if r > 1.3:
                    flags.append(meas)
        summary["vs_composed_model"] = ratios
        summary["stages_over_1p3x"] = flags
        summary["composed_model_hours"] = round(
            sum(model.values()) / 3600.0, 3)
    summary["rss"] = sampler.summary()
    results["summary"] = summary
    save()
    print(json.dumps(summary, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
