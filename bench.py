"""Headline benchmark: train-step throughput on the flagship config.

Measures the full jitted training step (forward + loss + backward + optimizer
update) for unet_resnet50, binary BCE, 512x512, batch 8, bf16 compute — the
reference's default model (/root/reference/train.py:552) at its training
resolution — on whatever accelerator JAX selects (TPU v5e under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``vs_baseline`` compares against the measured PyTorch reference on this
host (BASELINE_MEASURED.json — the reference publishes no numbers, and no
CUDA GPU exists here, so the reference baseline is CPU torch).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.engine import TrainState, steps
    from unet_embroidery_seg_tpu.models import build_model, init_model
    from unet_embroidery_seg_tpu.ops import schedules
    from unet_embroidery_seg_tpu.parallel import make_mesh, replicate, shard_batch_arrays

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    mesh = make_mesh()
    model = build_model("unet_resnet50", num_classes=2, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (size, size))
    tx = schedules.make_train_optimizer(1e-4)
    state = TrainState.create(variables, tx)
    state = jax.device_put(state, replicate(mesh))
    train_step = steps.make_binary_train_step(model, tx, "bce", pos_weight=5.0)

    rng = np.random.RandomState(0)
    images = rng.rand(batch, size, size, 3).astype(np.float32)
    pngs = (rng.rand(batch, size, size) > 0.7).astype(np.int32)
    sample_mask = np.ones(batch, np.float32)
    images, pngs, sample_mask = shard_batch_arrays(mesh, images, pngs, sample_mask)
    step_rng = jax.random.PRNGKey(1)

    # Time N steps inside ONE jitted fori_loop and force completion by
    # FETCHING the final loss value (block_until_ready alone returns early on
    # relayed backends). Run two loop lengths and subtract so dispatch/RTT
    # overhead cancels: per_step = (t_long - t_short) / (n_long - n_short).
    def make_loop(n):
        @jax.jit
        def loop(state, images, pngs, sample_mask, step_rng):
            def body(_, carry):
                st, _loss = carry
                st, loss = train_step(st, images, pngs, sample_mask, step_rng)
                return (st, loss)

            return jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))

        return loop

    n_short = max(n_steps // 4, 1)
    times = {}
    for n in (n_short, n_steps):
        loop = make_loop(n)
        _, loss = loop(state, images, pngs, sample_mask, step_rng)
        float(loss)  # compile + warmup + forced completion
        t0 = time.perf_counter()
        _, loss = loop(state, images, pngs, sample_mask, step_rng)
        float(loss)
        times[n] = time.perf_counter() - t0

    per_step = (times[n_steps] - times[n_short]) / (n_steps - n_short)
    ips = batch / per_step
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")) as f:
            baseline = json.load(f)["torch_reference_cpu"]["images_per_sec"]
    except Exception:
        pass
    vs = round(ips / baseline, 2) if baseline else None
    print(
        json.dumps(
            {
                "metric": f"train images/sec (unet_resnet50 bce {size}x{size} b{batch} bf16, {jax.devices()[0].platform})",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
