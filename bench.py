"""Headline benchmark: train-step throughput on the flagship config.

Measures the full jitted training step (forward + loss + backward + optimizer
update) for unet_resnet50, binary BCE, 512x512, bf16 compute — the
reference's default model (/root/reference/train.py:552) at its training
resolution — at batch 8 (round-1 headline) and batch 16 (the BASELINE.json
north-star batch), on whatever accelerator JAX selects (TPU v5e under the
driver).

Prints ONE JSON line. ``value`` is b8 images/sec; the honest context rides
along as extra keys: ms/step, model TF/s (FLOPs from XLA cost analysis),
and % of this chip's matmul ceiling measured live (8k bf16 matmul) — the
number that actually says how far from speed-of-light the step is.
``vs_baseline`` is vs the measured torch reference on this host
(BASELINE_MEASURED.json; CPU-only — no CUDA GPU exists here — so it is a
sanity floor, not the quality bar; ``pct_of_matmul_peak`` is the bar).
"""

from __future__ import annotations

import json
import os
import time


def _timed_loop(fn, args, n_long: int, n_short: int) -> float:
    """Per-step seconds via two loop lengths so dispatch/RTT cancels.

    Completion is forced by FETCHING the result value — block_until_ready
    alone returns early on relayed backends (ROADMAP.md environment traps).
    """
    times = {}
    for n in (n_short, n_long):
        loop = fn(n)
        float(loop(*args)[1])  # compile + warmup
        t0 = time.perf_counter()
        float(loop(*args)[1])
        times[n] = time.perf_counter() - t0
    return (times[n_long] - times[n_short]) / (n_long - n_short)


def _matmul_ceiling_tflops(jax, jnp) -> float:
    """Measured bf16 matmul peak on this chip (8192^3, the MXU's best case)."""
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    def make(steps):
        @jax.jit
        def loop(a, b):
            def body(_, c):
                return jnp.tanh(c @ b)  # tanh breaks trivial CSE, cheap on VPU

            out = jax.lax.fori_loop(0, steps, body, a)
            return out, out[0, 0]

        return loop

    per_step = _timed_loop(make, (a, b), 24, 6)
    return 2 * n**3 / per_step / 1e12


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.engine import TrainState, steps
    from unet_embroidery_seg_tpu.models import build_model, init_model
    from unet_embroidery_seg_tpu.ops import schedules
    from unet_embroidery_seg_tpu.parallel import make_mesh, replicate, shard_batch_arrays

    size = int(os.environ.get("BENCH_SIZE", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "8,16").split(",")]

    mesh = make_mesh()
    model = build_model(
        "unet_resnet50", num_classes=2, dtype=jnp.bfloat16, diff_head=True
    )
    tx = schedules.make_train_optimizer(1e-4)
    train_step = steps.make_binary_train_step(model, tx, "bce", pos_weight=5.0)
    step_rng = jax.random.PRNGKey(1)

    results = {}
    for batch in batches:
        variables = init_model(model, jax.random.PRNGKey(0), (size, size))
        state = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
        rng = np.random.RandomState(0)
        images = rng.rand(batch, size, size, 3).astype(np.float32)
        pngs = (rng.rand(batch, size, size) > 0.7).astype(np.int32)
        sample_mask = np.ones(batch, np.float32)
        images, pngs, sample_mask = shard_batch_arrays(mesh, images, pngs, sample_mask)

        def make_loop(n):
            @jax.jit
            def loop(state, images, pngs, sample_mask, step_rng):
                def body(_, carry):
                    st, _loss = carry
                    return train_step(st, images, pngs, sample_mask, step_rng)

                return jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))

            return loop

        per_step = _timed_loop(
            make_loop, (state, images, pngs, sample_mask, step_rng),
            n_steps, max(n_steps // 4, 1),
        )

        # Model FLOPs per step from XLA's own cost analysis of ONE step.
        try:
            one = train_step.lower(
                state, images, pngs, sample_mask, step_rng
            ).compile()
            flops = float(one.cost_analysis()["flops"])
        except Exception:
            flops = float("nan")

        results[batch] = {
            "images_per_sec": round(batch / per_step, 2),
            "ms_per_step": round(per_step * 1e3, 2),
            "model_tflops_per_sec": round(flops / per_step / 1e12, 1),
        }
        del state

    ceiling = round(_matmul_ceiling_tflops(jax, jnp), 1)
    b0 = batches[0]
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")) as f:
            baseline = json.load(f)["torch_reference_cpu"]["images_per_sec"]
    except Exception:
        pass

    out = {
        "metric": f"train images/sec (unet_resnet50 bce {size}x{size} b{b0} bf16, "
                  f"{jax.devices()[0].platform})",
        "value": results[b0]["images_per_sec"],
        "unit": "images/sec",
        "vs_baseline": round(results[b0]["images_per_sec"] / baseline, 2) if baseline else None,
        "ms_per_step": results[b0]["ms_per_step"],
        "model_tflops_per_sec": results[b0]["model_tflops_per_sec"],
        "matmul_ceiling_tflops": ceiling,
        "pct_of_matmul_peak": round(
            100 * results[b0]["model_tflops_per_sec"] / ceiling, 1
        ),
        "vs_baseline_note": "torch reference on this host is CPU-only; "
                            "pct_of_matmul_peak is the quality bar",
    }
    for b in batches[1:]:
        out[f"b{b}"] = results[b]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
