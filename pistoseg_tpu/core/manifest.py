"""Content-hashed artifact manifests for idempotent stage re-runs.

The reference's ``run.sh`` has no failure handling: a crashed stage lets
later stages consume stale artifacts silently (SURVEY.md §5.3).  Here
every stage can record a manifest of (input-content hashes, config hash)
next to its outputs; re-runs verify the manifest and can skip work that
is already current — and, more importantly, *refuse* to silently consume
outputs produced from different inputs.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, Optional

MANIFEST_NAME = "manifest.json"


def hash_file(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def hash_tree(root: str | Path, pattern: str = "**/*", limit: Optional[int] = None) -> str:
    """Order-independent content hash of a directory tree (or file)."""
    root = Path(root)
    if root.is_file():
        return hash_file(root)
    h = hashlib.sha256()
    files = sorted(p for p in root.glob(pattern) if p.is_file())
    if limit is not None:
        files = files[:limit]
    for p in files:
        h.update(str(p.relative_to(root)).encode())
        h.update(hash_file(p).encode())
    return h.hexdigest()


def hash_config(config: Dict) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()


def write_manifest(
    out_dir: str | Path,
    stage: str,
    inputs: Dict[str, str],       # name -> content hash (from hash_tree)
    config: Dict,
    outputs: Optional[Dict[str, int]] = None,
) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    doc = {
        "stage": stage,
        "inputs": inputs,
        "config_hash": hash_config(config),
        "outputs": outputs or {},
    }
    path = out / MANIFEST_NAME
    path.write_text(json.dumps(doc, indent=2, sort_keys=True))
    return path


def read_manifest(out_dir: str | Path) -> Optional[Dict]:
    p = Path(out_dir) / MANIFEST_NAME
    if not p.exists():
        return None
    return json.loads(p.read_text())


def stage_is_current(
    out_dir: str | Path, stage: str, inputs: Dict[str, str], config: Dict
) -> bool:
    """True iff out_dir holds a manifest matching these inputs + config."""
    doc = read_manifest(out_dir)
    if doc is None or doc.get("stage") != stage:
        return False
    return doc.get("inputs") == inputs and doc.get("config_hash") == hash_config(config)
