"""pistoseg_tpu — a TPU-native JAX/XLA framework rebuilding PistoSeg (AAAI'23).

PistoSeg turns image-level tissue labels into a fully supervised semantic
segmentation model through a five-stage pipeline (CAM generation, mosaic
dataset synthesis, preliminary segmentation, RFM pseudo-mask revision,
precise segmentation).  This package re-designs that capability set
TPU-first: NHWC tensors, bfloat16-friendly models, deterministic
matmul-based resampling (replacing torch's nondeterministic
``F.interpolate``), ``pjit``/``shard_map`` data parallelism over an ICI
mesh, and Pallas kernels for the hot per-patch emission paths.

Reference implementation surveyed in SURVEY.md (Vison307/PistoSeg).
"""

__version__ = "0.1.0"

from pistoseg_tpu.core.config import (  # noqa: F401
    Config,
    DatasetProfile,
    DATASET_PROFILES,
)
