"""Pallas TPU kernels for the hot ops (SURVEY.md §7.1 step 8).

Note: an overlap-add stitch kernel was prototyped and removed — XLA
already lowers the ``lax.scan`` + ``dynamic_update_slice`` stitcher
(:func:`pistoseg_tpu.ops.stitch.stitch_canvas`) to in-place windowed
updates on the loop-carried canvas, so a hand kernel bought nothing and
could not satisfy Mosaic's lane-alignment rules for C≈4 channel windows.

Import-safe on any backend: wrappers fall back to the pure-XLA reference
implementations when not running on TPU (or when ``interpret=True`` is
requested for testing).
"""

from pistoseg_tpu.ops.pallas.rfm_attention import rfm_attention  # noqa: F401
