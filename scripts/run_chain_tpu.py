"""Run the full five-stage chain (tests/util_chain.py) on the REAL chip.

The pytest harness pins the chain to the 8-virtual-CPU mesh (conftest);
this script drives the IDENTICAL chain code on whatever backend jax picks
(the tunneled TPU under axon), recording wall time and final metrics for
STATUS.md.  Usage:

    PYTHONPATH=tests python scripts/run_chain_tpu.py [workdir]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT))

import jax  # noqa: E402

from pistoseg_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from util_chain import golden_payload, run_full_chain  # noqa: E402


def main():
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="pistoseg_chain_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"[chain] backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.monotonic()
    chain = run_full_chain(work)
    dt = time.monotonic() - t0
    payload = golden_payload(chain)
    print(json.dumps({
        "backend": jax.default_backend(),
        "wall_s": round(dt, 1),
        "metrics": payload["metrics"],
        "counts": payload["counts"],
        "n_artifacts": len(payload["digests"]),
        "workdir": str(work),
    }, indent=2))


if __name__ == "__main__":
    main()
