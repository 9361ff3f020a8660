"""Execute the FULL WSSS4LUAD pipeline at the reference's budgets on the
real chip — the measurement that validates (or refutes) the composed
end-to-end model in ``bench.py::compose_e2e`` (VERDICT r4 #1).

Mirrors ``run_wsss4luad.sh`` stage-for-stage with the production loaders
(shard caches for stages 0/2/5) over a full-size synthetic dataset shaped
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

Every stage runs in its OWN subprocess (``--worker=<stage>``), like the
reference's run.sh launches each stage as a fresh python process.  This
is load-bearing here: the tunneled TPU client leaks ~100% of every
host→device transfer's bytes as host RSS (round-5 probe: 30×3.1 MB f32
uploads → +92 MB RSS, unaffected by dtype, shape reuse, donation,
``.delete()``, gc or ``malloc_trim``), so a single-process run of the
full pipeline accumulates >120 GB of dead staging buffers and OOMs (the
first scale-1.0 attempt died exactly there, 2026-08-20).  Per-stage
workers return the leak to the OS at each stage boundary; the biggest
single-stage leak (stage 2: 15 epochs × 3 GB uint8 uploads ≈ 45 GB)
fits the 125 GB host.  Stage 0b is further chunked (``--chunk=a:b``)
because its multiscale float32 uploads leak ~7.6 MB per image ≈ 77 GB
over the full split.

Every stage is wall-timed (wall includes the worker's process + TPU
client startup — the reference pays the same per-stage python startup);
training stages additionally report the steady-state
``items_per_sec``/``compile_seconds`` from their epoch logs, and the
worker's host RSS is sampled throughout (multi-hour memory stability).
The result is written to ``perf/full_budget_wsss4luad.json`` (picked up
by ``bench.py`` into BENCH extras) with a per-stage comparison against
the composed model: any stage >1.3× over its modeled time is flagged.

Resumable across launches: a fixed workdir + stage manifests
(inference/export stages skip-if-current) + ``resume=True`` training
stages, and the results JSON MERGES across launches — a stage not in
``--stages`` keeps its previously-measured wall (used to keep the
2798 s measured s0_train after the OOM relaunch).

Usage::

    python scripts/run_full_budget.py [--workdir=/tmp/pistoseg_full_budget]
        [--scale=1.0]
        [--stages=gen,s0_train,s0b_export,s1_prep,s2_train,s3_infer,
                  s4_train,s4b_infer,s5_train,s5_test]
"""

from __future__ import annotations

import copy
import json
import os
import subprocess
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

S0B_CHUNK = 2048            # ≈15 GB leaked f32 upload bytes per worker
                            # (override with --s0b-chunk=N)

STAGE_ORDER = ["gen", "s0_train", "s0b_export", "s1_prep", "s2_train",
               "s3_infer", "s4_train", "s4b_infer", "s5_train", "s5_test"]


def build_cfg(scale: float):
    """The run's config — shared verbatim by parent and every worker so
    stage manifests agree across launches."""
    from pistoseg_tpu.core.config import Config

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
    # PISTOSEG_S0_EPOCHS: checkpoint-REPRODUCTION override, not a budget
    # change.  Used after the workdir (but not the results JSON) is lost:
    # the full-budget s0_train wall stays the previously-measured 20-epoch
    # number (merge semantics), while a short re-train rebuilds the stage-0
    # checkpoint the downstream stages consume.  Launches recording a wall
    # under this override must write to a scratch --out (the parent refuses
    # nothing here — provenance is recorded in the launch row).
    if os.environ.get("PISTOSEG_S0_EPOCHS"):
        cfg.cam.epochs = int(os.environ["PISTOSEG_S0_EPOCHS"])
    return cfg


class RssSampler(threading.Thread):
    """Samples a (worker) pid's RSS; the leak lives in the worker."""

    def __init__(self, interval: float = 15.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.samples = []
        self.pid = None
        self._stop = threading.Event()

    def _rss_gb(self) -> float:
        pid = self.pid
        if pid is None:
            return 0.0
        try:
            for line in open(f"/proc/{pid}/status"):
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
        except OSError:
            return 0.0
        return 0.0

    def run(self):
        while not self._stop.wait(self.interval):
            v = self._rss_gb()
            if v:
                self.samples.append((time.monotonic(), v))

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


# --------------------------------------------------------------------------
# stage implementations (run inside workers; may initialize the TPU)
# --------------------------------------------------------------------------

def run_stage(name: str, work: Path, cfg, chunk=None) -> dict:
    train = str(work / "training")
    valid, test = work / "validation", work / "testing"
    logs = work / "logs"
    cam_dir = work / "CAM" / "train"
    s0_ckpt = str(logs / "stage0" / "checkpoints")
    mosaic = work / "mosaic"

    if name == "s0_train":
        from pistoseg_tpu.stages.stage0_cam import train_stage0
        return train_stage0(
            cfg, train, val_images=str(valid / "img"),
            val_masks=str(valid / "mask"), log_dir=str(logs / "stage0"),
            shard_cache=str(work / "stage0_shards"), resume=True)

    if name == "s0b_export":
        from pistoseg_tpu.stages.stage0_export_cam import export_cams
        return export_cams(cfg, train, s0_ckpt, str(cam_dir), chunk=chunk)

    if name == "s1_prep":
        from pistoseg_tpu.stages.stage1_split import split_images
        from pistoseg_tpu.stages.stage1_synthesize import synthesize
        done = (mosaic / "img").exists() and \
            len(list((mosaic / "img").glob("*.png"))) >= cfg.synth.num_images
        r = ({"images": cfg.synth.num_images, "skipped": True} if done
             else synthesize(cfg, train, str(mosaic)))
        for gname, root, ps, st, scl in (
            ("patches_224_56", valid, 224, 56, (1.0,)),
            ("patches_224_112", valid, 224, 112, (1.0, 1.25, 1.5, 1.75, 2.0)),
            ("patches_224_112", test, 224, 112, (1.0, 1.25, 1.5, 1.75, 2.0)),
        ):
            out = root / gname
            if not (out / "img").exists() or not any((out / "img").iterdir()):
                sp = split_images(cfg, str(root), str(out), patch_size=ps,
                                  stride=st, scales=scl)
                r[f"{root.name}/{gname}"] = sp.get("patches", 0)
        return r

    if name == "s2_train":
        from pistoseg_tpu.stages.stage2_mosaic import train_stage2
        return train_stage2(
            cfg, str(mosaic), val_data=str(valid / "patches_224_112"),
            val_big_root=str(valid), log_dir=str(logs / "stage2"),
            shard_cache=str(work / "mosaic_shards"), resume=True)

    if name == "s3_infer":
        from pistoseg_tpu.stages.stage3_infer_pmask import infer_stage3
        # batch 64 × 8 d4 views = 512-sample effective forward — the largest
        # shape proven to fit v5e HBM (batch 512 × TTA OOMed at 19.7 GB on a
        # bf16[4096,112,112,192] decoder intermediate)
        cfg3 = copy.deepcopy(cfg)
        cfg3.infer.batch_size = 64
        return infer_stage3(
            cfg3, train, str(logs / "stage2" / "checkpoints"),
            str(work / "pseudo"))

    if name == "s4_train":
        from pistoseg_tpu.stages.stage4_revise import train_stage4
        # warm-start the backbone from the stage-0 classifier (the reference
        # loads the published res38d weights here; absent those files, the
        # in-pipeline classifier is the non-random source — apply_stage0_trunk)
        return train_stage4(
            cfg, train, str(work / "pseudo" / "logits_32x32"), str(cam_dir),
            log_dir=str(logs / "stage4"), resume=True,
            pretrained_stage0=s0_ckpt)

    if name == "s4b_infer":
        from pistoseg_tpu.stages.stage4b_infer_revise import infer_stage4b
        return infer_stage4b(
            cfg, train, str(work / "pseudo" / "logits_32x32"), str(cam_dir),
            str(logs / "stage4" / "checkpoints"),
            out_dir=str(work / "refine"))

    if name == "s5_train":
        from pistoseg_tpu.stages.stage5_train import train_stage5
        return train_stage5(
            cfg, train, str(work / "refine" / "cam"),
            val_data=str(valid / "patches_224_56"), val_big_root=str(valid),
            log_dir=str(logs / "stage5"),
            shard_cache=str(work / "stage5_shards"), resume=True)

    if name == "s5_test":
        from pistoseg_tpu.stages.stage5_test import test_stage5
        cfg5t = copy.deepcopy(cfg)
        cfg5t.infer.batch_size = 256
        return test_stage5(
            cfg5t, str(test / "patches_224_112"),
            str(logs / "stage5" / "checkpoints"),
            save_dir=str(logs / "stage5" / "test"), big_root=str(test))

    raise SystemExit(f"unknown worker stage {name}")


def worker_main(name: str, work: Path, scale: float, chunk) -> None:
    import os

    import jax

    # the ambient sitecustomize force-selects the TPU and IGNORES the
    # JAX_PLATFORMS env var — a CPU logic test of this harness must set
    # PISTOSEG_PLATFORM=cpu, which we honor the only way that works
    # (verify-skill gotcha)
    if os.environ.get("PISTOSEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PISTOSEG_PLATFORM"])

    from pistoseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_cfg(scale)
    r = run_stage(name, work, cfg, chunk=chunk)
    out = {"backend": jax.default_backend()}
    if isinstance(r, dict):
        out.update({k: v for k, v in r.items()
                    if isinstance(v, (int, float, str, bool))})
    res_dir = work / "results"
    res_dir.mkdir(exist_ok=True)
    tag = name if chunk is None else f"{name}.{chunk[0]}_{chunk[1]}"
    (res_dir / f"{tag}.json").write_text(json.dumps(out))


def compute_summary(results: dict, scale: float, sampler: RssSampler) -> dict:
    """Measured walls vs the composed per-stage model (BENCH_r04 rates).

    Safe to call on a PARTIAL results dict: ``complete`` is only true when
    every stage in STAGE_ORDER has a measured wall, and the e2e hours are
    withheld until then — a crashed/interrupted launch must not masquerade
    as the full measured pipeline (bench.py keys off ``complete``).
    """
    stage_wall = results["stage_wall_s"]
    pipeline_keys = [k for k in stage_wall if k not in ("gen", "s1_prep")]
    measured_total = sum(stage_wall[k] for k in pipeline_keys)
    complete = all(k in stage_wall for k in STAGE_ORDER)
    summary = {
        "backend": results.get("backend"),
        "scale": scale,
        "complete": complete,
        "e2e_measured_hours": (
            round(sum(stage_wall.values()) / 3600.0, 3) if complete
            else None),
        "e2e_device_stages_hours": (
            round(measured_total / 3600.0, 3) if complete else None),
        "device_stages_partial_hours": round(measured_total / 3600.0, 3),
        "host_prep_hours": round(
            sum(stage_wall.get(k, 0) for k in ("gen", "s1_prep")) / 3600.0, 3),
        "stage_wall_s": stage_wall,
        "stages_measured": sorted(stage_wall),
    }
    # composed per-stage model (BENCH_r04 rates over these budgets)
    bench_path = _ROOT / "BENCH_r04.json"
    if scale == 1.0 and bench_path.exists():
        model = json.loads(bench_path.read_text())["parsed"]["extras"]["e2e"][
            "ours_stage_s"]
        ratios, flags = {}, []
        for name in ("s0_train", "s0b_export", "s2_train", "s3_infer",
                     "s4_train", "s4b_infer", "s5_train", "s5_test"):
            if name in stage_wall and model.get(name):
                r = stage_wall[name] / model[name]
                ratios[name] = round(r, 2)
                if r > 1.3:
                    flags.append(name)
        summary["vs_composed_model"] = ratios
        summary["stages_over_1p3x"] = flags
        summary["composed_model_hours"] = round(
            sum(model.values()) / 3600.0, 3)
    summary["rss"] = sampler.summary()
    return summary


# --------------------------------------------------------------------------
# parent: spawns one worker per stage, merges results across launches.
# MUST NOT touch jax — the TPU is exclusive to the live worker.
# --------------------------------------------------------------------------

def spawn_worker(name: str, work: Path, scale: float, sampler: RssSampler,
                 chunk=None) -> dict:
    cmd = [sys.executable, str(Path(__file__).resolve()),
           f"--worker={name}", f"--workdir={work}", f"--scale={scale}"]
    tag = name
    if chunk is not None:
        cmd.append(f"--chunk={chunk[0]}:{chunk[1]}")
        tag = f"{name}.{chunk[0]}_{chunk[1]}"
    proc = subprocess.Popen(cmd)
    sampler.pid = proc.pid
    rc = proc.wait()
    sampler.pid = None
    if rc != 0:
        raise RuntimeError(f"worker {tag} exited {rc}")
    res = work / "results" / f"{tag}.json"
    return json.loads(res.read_text()) if res.exists() else {}


def main():
    workdir = "/tmp/pistoseg_full_budget"
    scale = 1.0
    only = None
    worker = None
    chunk = None
    s0b_chunk = S0B_CHUNK
    out_override = None
    for a in sys.argv[1:]:
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--scale="):
            scale = float(a.split("=", 1)[1])
        elif a.startswith("--stages="):
            only = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--worker="):
            worker = a.split("=", 1)[1]
        elif a.startswith("--chunk="):
            lo, hi = a.split("=", 1)[1].split(":")
            chunk = (int(lo), int(hi))
        elif a.startswith("--s0b-chunk="):
            s0b_chunk = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_override = a.split("=", 1)[1]
        else:
            raise SystemExit(f"unknown arg {a}")
    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)

    if worker is not None:
        worker_main(worker, work, scale, chunk)
        return

    out_path = (Path(out_override) if out_override
                else _ROOT / "perf" / "full_budget_wsss4luad.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    # refuse to clobber a different run's record (a test launch at another
    # workdir/scale must pass --out; learned the hard way)
    if out_path.exists() and not out_override:
        prev_head = json.loads(out_path.read_text())
        if (prev_head.get("workdir") != str(work)
                or prev_head.get("scale") != scale):
            raise SystemExit(
                f"{out_path} records workdir={prev_head.get('workdir')} "
                f"scale={prev_head.get('scale')} — pass --out=... for a "
                "different run")

    # merge across launches: stages not executed now keep their previous
    # measured walls (the whole point of resuming after a crash)
    results: dict = {"scale": scale, "workdir": str(work), "stage_wall_s": {},
                     "stage_detail": {}, "started": time.strftime("%F %T")}
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        if prev.get("workdir") == str(work) and prev.get("scale") == scale:
            for k in ("stage_wall_s", "stage_detail", "dataset", "backend",
                      "final_metrics", "n_test_patches", "launches"):
                if k in prev:
                    results[k] = prev[k]
    launch_row = {"started": results["started"],
                  "stages": sorted(only) if only else "all"}
    if os.environ.get("PISTOSEG_S0_EPOCHS"):
        launch_row["s0_epochs_override"] = int(
            os.environ["PISTOSEG_S0_EPOCHS"])
    results.setdefault("launches", []).append(launch_row)

    print(f"[full-budget] scale={scale} workdir={work} "
          f"stages={sorted(only) if only else 'all'}", flush=True)

    sampler = RssSampler()
    sampler.start()

    def save():
        results["rss"] = sampler.summary()
        # summary is recomputed on EVERY save so a launch killed mid-run
        # (session end, OOM) still leaves a compact partial summary with
        # complete=False — bench.py embeds this instead of the raw dict
        # and only promotes the measured headline when complete is true
        results["summary"] = compute_summary(results, scale, sampler)
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
            if "backend" in r:
                results["backend"] = r["backend"]
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
        save()
    n_train = results.get("dataset", {}).get(
        "n_train", len(list((work / "training").glob("*.png"))))

    logs = work / "logs"

    def s0b():
        # chunked workers: each leaks ≤ chunk × ~7.6 MB and exits (see
        # module docstring); completed chunks are skipped on relaunch via
        # the per-stem existence check in export_cams(chunk=...)
        last = {}
        for lo in range(0, n_train, s0b_chunk):
            hi = min(lo + s0b_chunk, n_train)
            last = spawn_worker("s0b_export", work, scale, sampler,
                                chunk=(lo, hi))
            if last.get("skipped"):
                print("[full-budget] s0b_export manifest current — skip",
                      flush=True)
                return last
        return last

    stage_fns = {
        "s0_train": lambda: spawn_worker("s0_train", work, scale, sampler),
        "s0b_export": s0b,
        "s1_prep": lambda: spawn_worker("s1_prep", work, scale, sampler),
        "s2_train": lambda: spawn_worker("s2_train", work, scale, sampler),
        "s3_infer": lambda: spawn_worker("s3_infer", work, scale, sampler),
        "s4_train": lambda: spawn_worker("s4_train", work, scale, sampler),
        "s4b_infer": lambda: spawn_worker("s4b_infer", work, scale, sampler),
        "s5_train": lambda: spawn_worker("s5_train", work, scale, sampler),
        "s5_test": lambda: spawn_worker("s5_test", work, scale, sampler),
    }
    log_stage = {"s0_train": ("stage0", "stage0"), "s2_train": ("stage2", "stage2"),
                 "s4_train": ("stage4", "stage4"), "s5_train": ("stage5", "stage5")}

    for name in STAGE_ORDER[1:]:
        r = timed(name, stage_fns[name])
        if r is not None and name in log_stage:
            sub, st = log_stage[name]
            results["stage_detail"].setdefault(name, {}).update(
                steady_state_from_log(logs / sub, st))
            save()
        if r is not None and name == "s1_prep":
            results["n_test_patches"] = len(list(
                (work / "testing" / "patches_224_112" / "img").glob("*.png")))
            save()
        if r is not None and name == "s5_test":
            results["final_metrics"] = {
                k: round(float(v), 4) for k, v in r.items()
                if isinstance(v, (int, float)) and k != "backend"}
            save()

    # ---- summary: measured vs the composed model -------------------------
    sampler.stop()
    save()
    print(json.dumps(results["summary"], indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
