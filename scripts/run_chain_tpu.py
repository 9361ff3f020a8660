"""Run the full five-stage chain (tests/util_chain.py) on the REAL chip.

The pytest harness pins the chain to the 8-virtual-CPU mesh (conftest);
this script drives the IDENTICAL chain code on whatever backend jax picks
(the tunneled TPU under axon), recording wall time, final metrics AND the
full golden payload (65 artifact digests) for STATUS.md.  Usage:

    PYTHONPATH=tests python scripts/run_chain_tpu.py [workdir]
        runs the chain; writes {workdir}/payload.json

    python scripts/run_chain_tpu.py --compare-digests A.json B.json
        compares two recorded payloads (TPU run-to-run bit-determinism,
        VERDICT r4 #4: BASELINE.md promises bit-reproducible deterministic
        interpolation — two independent chip runs must agree bit-exactly);
        exits non-zero listing every diverging artifact/metric.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT))


def compare_payloads(path_a: str, path_b: str) -> int:
    a = json.loads(Path(path_a).read_text())
    b = json.loads(Path(path_b).read_text())
    rc = 0
    da, db = a["digests"], b["digests"]
    only_a = sorted(set(da) - set(db))
    only_b = sorted(set(db) - set(da))
    diff = sorted(k for k in set(da) & set(db) if da[k] != db[k])
    for k in only_a:
        print(f"[compare] only in A: {k}")
    for k in only_b:
        print(f"[compare] only in B: {k}")
    for k in diff:
        print(f"[compare] DIGEST DIVERGES: {k}\n  A={da[k]}\n  B={db[k]}")
    if only_a or only_b or diff:
        rc = 1
    for k in sorted(set(a["metrics"]) | set(b["metrics"])):
        va, vb = a["metrics"].get(k), b["metrics"].get(k)
        if va != vb:
            print(f"[compare] METRIC DIVERGES: {k}: A={va!r} B={vb!r}")
            rc = 1
    if a.get("counts") != b.get("counts"):
        print(f"[compare] COUNTS DIVERGE: A={a.get('counts')} B={b.get('counts')}")
        rc = 1
    n = len(set(da) & set(db)) - len(diff)
    print(f"[compare] {n} artifact digests identical, {len(diff)} diverged; "
          f"metrics {'identical' if rc == 0 else 'DIVERGED'} "
          f"(backends: A={a.get('backend')} B={b.get('backend')})")
    return rc


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--compare-digests":
        sys.exit(compare_payloads(sys.argv[2], sys.argv[3]))

    import jax  # noqa: E402

    from pistoseg_tpu.core.cache import enable_compilation_cache  # noqa: E402

    enable_compilation_cache()

    from util_chain import golden_payload, run_full_chain  # noqa: E402

    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="pistoseg_chain_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"[chain] backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.monotonic()
    chain = run_full_chain(work)
    dt = time.monotonic() - t0
    payload = golden_payload(chain)
    record = dict(payload, backend=jax.default_backend(),
                  wall_s=round(dt, 1), workdir=str(work))
    (work / "payload.json").write_text(json.dumps(record, indent=2,
                                                  sort_keys=True))
    print(json.dumps({
        "backend": record["backend"],
        "wall_s": record["wall_s"],
        "metrics": payload["metrics"],
        "counts": payload["counts"],
        "n_artifacts": len(payload["digests"]),
        "workdir": str(work),
        "payload": str(work / "payload.json"),
    }, indent=2))


if __name__ == "__main__":
    main()
