"""Test harness: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize force-registers the TPU plugin and overrides the
``JAX_PLATFORMS`` env var, so setting env alone silently leaves tests on
the (single, tunneled) TPU.  The reliable switch is the in-process config
update, done here before any test imports jax-dependent modules.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"
