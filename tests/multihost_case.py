"""Shared single-step training case for the two-process DCN test.

Both the workers (tests/dcn_worker.py, 2 processes x 4 devices) and the
single-process reference (tests/test_multihost_dcn.py, 1 process x 8
devices) call ``run_one_step`` on the same deterministic global batch; data
parallelism must make the results process-layout-invariant.
"""

from __future__ import annotations

import numpy as np

SIZE = 32
BATCH = 8


def GLOBAL_BATCH():
    rng = np.random.RandomState(7)
    images = rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32)
    pngs = (rng.rand(BATCH, SIZE, SIZE) > 0.6).astype(np.int32)
    mask = np.ones(BATCH, np.float32)
    return images, pngs, mask


def run_one_step(mesh, state_sharding, images, pngs, mask):
    """One bce train step on unet_plain; returns (loss, param checksum)."""
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.engine import TrainState, steps
    from unet_embroidery_seg_tpu.models import build_model, init_model
    from unet_embroidery_seg_tpu.ops import schedules

    model = build_model("unet_plain", num_classes=2, diff_head=True)
    variables = init_model(model, jax.random.PRNGKey(0), (SIZE, SIZE))
    tx = schedules.make_train_optimizer(1e-3, param_dtype=jnp.float32)
    state = jax.device_put(TrainState.create(variables, tx), state_sharding)
    train_step = steps.make_binary_train_step(model, tx, "bce", pos_weight=2.0)

    state, loss = train_step(state, images, pngs, mask, jax.random.PRNGKey(1))

    @jax.jit
    def param_checksum(params):
        return sum(
            jnp.sum(jnp.abs(l.astype(jnp.float32)))
            for l in jax.tree.leaves(params)
        )

    return float(loss), float(param_checksum(state.params))
