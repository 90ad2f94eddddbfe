"""Profile the flagship train step: XLA trace -> per-op cost table.

Runs a few flagship (unet_resnet50 bce 512^2 b8 bf16) train steps under
``jax.profiler`` (works through the axon relay) and aggregates device-side op
durations from the trace, grouped by fusion/op name. This is the tool that
produced ROADMAP.md's perf table.

Usage: python scripts/profile_step.py [--steps 6] [--out /tmp/trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_trace(out: str, n_steps: int, batch: int, size: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.engine import TrainState, steps
    from unet_embroidery_seg_tpu.models import build_model, init_model
    from unet_embroidery_seg_tpu.ops import schedules
    from unet_embroidery_seg_tpu.parallel import make_mesh, replicate, shard_batch_arrays

    mesh = make_mesh()
    model = build_model(
        "unet_resnet50", num_classes=2, dtype=jnp.bfloat16, diff_head=True
    )
    variables = init_model(model, jax.random.PRNGKey(0), (size, size))
    tx = schedules.make_train_optimizer(1e-4)
    state = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
    train_step = steps.make_binary_train_step(model, tx, "bce", pos_weight=5.0)

    rng = np.random.RandomState(0)
    images = rng.rand(batch, size, size, 3).astype(np.float32)
    pngs = (rng.rand(batch, size, size) > 0.7).astype(np.int32)
    sample_mask = np.ones(batch, np.float32)
    images, pngs, sample_mask = shard_batch_arrays(mesh, images, pngs, sample_mask)
    key = jax.random.PRNGKey(1)

    for _ in range(3):  # compile + warm
        state, loss = train_step(state, images, pngs, sample_mask, key)
    float(loss)

    jax.profiler.start_trace(out)
    for _ in range(n_steps):
        state, loss = train_step(state, images, pngs, sample_mask, key)
    float(loss)
    jax.profiler.stop_trace()


def parse_trace(out: str, n_steps: int, top: int = 40) -> None:
    paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace files under", out)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device-side complete events live under TensorCore pids; host threads
    # have python/runtime names. Aggregate by event name.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Tensor" in name or "/device" in name.lower()
    }
    agg = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        agg[name] += dur
        counts[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device pids: {[pid_names[p] for p in device_pids]}")
    print(f"total device time: {total/1e3:.2f} ms over {n_steps} steps "
          f"=> {total/1e3/n_steps:.2f} ms/step")
    print(f"{'us/step':>10}  {'calls':>6}  name")
    for name, dur in agg.most_common(top):
        print(f"{dur/n_steps:10.0f}  {counts[name]:6d}  {name[:110]}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="/tmp/trace_step")
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()
    if not args.parse_only:
        run_trace(args.out, args.steps, args.batch, args.size)
    parse_trace(args.out, args.steps, args.top)


if __name__ == "__main__":
    main()
