"""Pallas TPU kernels for the hot ops (SURVEY.md §7.1 step 8).

Import-safe on any backend: wrappers fall back to the pure-XLA reference
implementations when not running on TPU (or when ``interpret=True`` is
requested for testing).
"""

from pistoseg_tpu.ops.pallas.rfm_attention import rfm_attention  # noqa: F401
from pistoseg_tpu.ops.pallas.stitch import stitch_accumulate  # noqa: F401
