"""Filename label grammars and patch-name metadata parsing.

The reference encodes image-level labels *in filenames* under two grammars
(SURVEY.md §0):

* WSSS4LUAD ``bracket-list``: ``name-[1, 0, 1].png`` — parsed by
  ``utils.py:26-51`` (``get_label`` + ``to_list``).
* BCSS ``digit-string``: ``name[1101].png`` — parsed by
  ``utils.py:20-21`` (``get_file_label``).

Patch filenames from the validation/test splitter additionally carry
position metadata: ``{idx}_{scale}_{y}_{x}-{label}.png``
(``split_validation.ipynb`` cell 5, consumed at ``mosaic_module.py:155-158``).

Note: the reference has a latent ``'wss4luad'`` typo (``dataset.py:151``)
that routes WSSS4LUAD through the generic digit parser and works only by
numeric coincidence (``utils.py:22-23`` indexes the same characters).  We
parse the grammar explicitly instead; golden tests pin equivalence.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Tuple, Union

PathLike = Union[str, Path]


def parse_label_str(stem_or_path: PathLike, grammar: str) -> str:
    """Extract the raw label substring (without brackets) from a filename."""
    name = Path(str(stem_or_path)).name
    m = re.search(r"\[([^\]]*)\]", name)
    if not m:
        raise ValueError(f"no [label] found in filename: {name}")
    return m.group(1)


def parse_label(stem_or_path: PathLike, grammar: str) -> List[int]:
    """Parse the image-level multilabel vector from a filename."""
    raw = parse_label_str(stem_or_path, grammar)
    if grammar == "bracket-list":
        return [int(tok) for tok in raw.split(",")]
    if grammar == "digit-string":
        return [int(ch) for ch in raw.strip()]
    raise ValueError(f"unknown label grammar: {grammar}")


def format_label(label: List[int], grammar: str) -> str:
    """Inverse of :func:`parse_label` — used when synthesizing filenames."""
    if grammar == "bracket-list":
        return "[" + ", ".join(str(int(v)) for v in label) + "]"
    if grammar == "digit-string":
        return "[" + "".join(str(int(v)) for v in label) + "]"
    raise ValueError(f"unknown label grammar: {grammar}")


def slide_id(patch_name: PathLike) -> str:
    """Slide/image id = text before the first '_' (``mosaic_module.py:155``)."""
    return Path(str(patch_name)).name.split("_")[0]


def parse_patch_name(patch_name: PathLike) -> Tuple[str, float, int, int]:
    """Parse ``{idx}_{scale}_{y}_{x}-{label}.png`` → (idx, scale, y, x).

    Matches the consumption sites ``mosaic_module.py:155-158`` /
    ``segmentation_test.py:160-168``.
    """
    stem = Path(str(patch_name)).name
    stem = stem.rsplit(".", 1)[0]
    head = stem.split("-")[0]
    parts = head.split("_")
    if len(parts) < 4:
        raise ValueError(f"not a positioned patch name: {patch_name}")
    idx = parts[0]
    scale = float(parts[1])
    y = int(parts[2])
    x = int(parts[3])
    return idx, scale, y, x
