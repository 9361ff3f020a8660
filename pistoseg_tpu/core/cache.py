"""Persistent XLA compilation cache.

Compiles through the axon remote-compile service take minutes; the
persistent cache turns every repeated (program, shapes) compile across
processes into a ~second deserialization.  Enabled by every stage CLI,
bench.py, and the driver entry points.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT = os.environ.get(
    "PISTOSEG_JAX_CACHE", str(Path.home() / ".cache" / "pistoseg_jax")
)
_enabled = False


def enable_compilation_cache(path: str | Path | None = None) -> None:
    global _enabled
    if _enabled:
        return
    p = Path(path or _DEFAULT)
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
