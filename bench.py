"""Headline benchmark: train + predict throughput on the flagship config.

Covers BOTH halves of the BASELINE.json north star ("images/sec/chip
train+predict @512^2"):

  - train: the full jitted step (forward + loss + backward + optimizer
    update) for unet_resnet50, binary, 512x512, bf16 compute — the
    reference's default model (/root/reference/train.py:552) at its training
    resolution — at batch 8 (headline), batch 16, AND with the CLI-default
    Lovasz-hinge loss (train.py --loss lovasz_hinge) at batch 8.
  - predict: inference forward (steps.make_predict_fn, softmax on device —
    what predict.py times at /root/reference/predict.py:134-145) at the
    reference's hardcoded 480^2 and the training 512^2, single-image AND
    batched. ``device_ms_per_image`` is the pure per-image device time
    (two-loop method); ``e2e_ms_per_image`` additionally includes one
    dispatch + full softmax fetch per call, i.e. what a predict.py user
    sees — on this relayed host that number is dominated by the ~10 MB/s
    host link, not the chip.

Prints ONE JSON line. ``value`` is train b8 images/sec; the honest context
rides along as extra keys: ms/step, model TF/s (FLOPs from XLA cost
analysis), % of this chip's matmul ceiling measured live (8k bf16 matmul),
the b16/lovasz train rows, and the predict table. ``vs_baseline`` is vs the
measured torch reference on this host (BASELINE_MEASURED.json; CPU-only —
no CUDA GPU exists here — so it is a sanity floor; ``pct_of_matmul_peak``
is the quality bar). Env knobs: BENCH_SIZE, BENCH_STEPS, BENCH_BATCHES,
BENCH_PREDICT=0 / BENCH_LOVASZ=0 to skip sections.
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
        # None (not NaN) on failure so the output stays strict JSON.
        try:
            one = train_step.lower(
                state, images, pngs, sample_mask, step_rng
            ).compile()
            flops = float(one.cost_analysis()["flops"])
        except Exception:
            flops = None

        results[batch] = {
            "images_per_sec": round(batch / per_step, 2),
            "ms_per_step": round(per_step * 1e3, 2),
            "model_tflops_per_sec": (
                round(flops / per_step / 1e12, 1) if flops else None
            ),
        }
        del state

    # --- Lovasz-hinge train row (the train.py CLI default loss) ------------
    lovasz = None
    if os.environ.get("BENCH_LOVASZ", "1") != "0":
        b = batches[0]
        lovasz_step = steps.make_binary_train_step(model, tx, "lovasz_hinge", None)
        variables = init_model(model, jax.random.PRNGKey(0), (size, size))
        state = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
        rng = np.random.RandomState(0)
        images = rng.rand(b, size, size, 3).astype(np.float32)
        pngs = (rng.rand(b, size, size) > 0.7).astype(np.int32)
        sample_mask = np.ones(b, np.float32)
        images, pngs, sample_mask = shard_batch_arrays(mesh, images, pngs, sample_mask)

        def make_lovasz_loop(n):
            @jax.jit
            def loop(state, images, pngs, sample_mask, step_rng):
                def body(_, carry):
                    st, _loss = carry
                    return lovasz_step(st, images, pngs, sample_mask, step_rng)

                return jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))

            return loop

        per_step = _timed_loop(
            make_lovasz_loop, (state, images, pngs, sample_mask, step_rng),
            n_steps, max(n_steps // 4, 1),
        )
        lovasz = {
            "images_per_sec": round(b / per_step, 2),
            "ms_per_step": round(per_step * 1e3, 2),
        }
        del state

    # --- Predict (inference) rows: the other half of the north star --------
    predict_rows = None
    if os.environ.get("BENCH_PREDICT", "1") != "0":
        predict_rows = {}
        pred_model = build_model("unet_resnet50", num_classes=2, dtype=jnp.bfloat16)

        for psize in (480, size):
            variables = init_model(pred_model, jax.random.PRNGKey(0), (psize, psize))

            def make_pred_loop(n):
                @jax.jit
                def loop(variables, x):
                    def body(_, x):
                        logits = pred_model.apply(variables, x, train=False)
                        # softmax on device (predict.py does this before the
                        # fetch) + feed a zero of it back so the loop carries
                        # a data dependence (anti-hoisting, ROADMAP traps).
                        p = jax.nn.softmax(logits, axis=-1)
                        return x + (p.mean() * 0.0).astype(x.dtype)

                    out = jax.lax.fori_loop(0, n, body, x)
                    return out, out[0, 0, 0, 0]

                return loop

            for pb in (1, batches[0]):
                x = np.random.RandomState(0).rand(pb, psize, psize, 3)
                x = jax.device_put(x.astype(np.float32))
                per_img = _timed_loop(
                    make_pred_loop, (variables, x), n_steps, max(n_steps // 4, 1)
                ) / pb

                row = {
                    "device_ms_per_image": round(per_img * 1e3, 2),
                    "images_per_sec": round(1.0 / per_img, 1),
                }
                if pb == 1:
                    # End-to-end per-image wall time, reference predict.py
                    # style: one dispatch + full softmax fetch per image.
                    pfn = jax.jit(
                        lambda v, x: jax.nn.softmax(
                            pred_model.apply(v, x, train=False), axis=-1
                        )
                    )
                    np.asarray(pfn(variables, x))  # compile + warmup
                    reps = 5
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        np.asarray(pfn(variables, x))
                    row["e2e_ms_per_image"] = round(
                        (time.perf_counter() - t0) / reps * 1e3, 1
                    )
                predict_rows[f"b{pb}_{psize}"] = row

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
        "pct_of_matmul_peak": (
            round(100 * results[b0]["model_tflops_per_sec"] / ceiling, 1)
            if results[b0]["model_tflops_per_sec"] and ceiling
            else None
        ),
        "vs_baseline_note": "torch reference on this host is CPU-only; "
                            "pct_of_matmul_peak is the quality bar",
    }
    for b in batches[1:]:
        out[f"b{b}"] = results[b]
    if lovasz is not None:
        out["train_lovasz"] = lovasz
    if predict_rows is not None:
        out["predict"] = predict_rows
        out["predict_note"] = (
            "device_ms_per_image = pure device time (incl. on-device softmax); "
            "e2e adds one dispatch + full softmax fetch (host-link bound here)"
        )
    print(json.dumps(out, allow_nan=False))


if __name__ == "__main__":
    main()
