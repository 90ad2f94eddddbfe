"""Flat-arena Adam: the TPU-native optimizer update.

Why this exists (measured on v5e, ROADMAP round 1): the stock optax chain
updates 176 parameter tensors in 176 tiny fused kernels (12.7 ms/step of the
63.5 ms unet_resnet50 train step), and storing master params in f32 makes
flax re-cast every tensor to bf16 inside each forward/backward (another big
slice of the 9.8 ms convert bucket). ``optax.flatten`` was measured 6 ms
*slower* because it ravels/unravels the tree every step.

The fix is structural, not a wrapper:

  - The optimizer state holds ONE flat f32 arena per moment: ``master`` (the
    f32 master copy of all parameters), ``mu`` and ``nu``. They are created
    once at init and donated every step, so Adam is ~4 fused elementwise
    kernels over three big arrays instead of 176×3 small ones.
  - The model params live in the TrainState as a **bf16 tree** (the compute
    dtype). The forward/backward consume them directly — zero per-step
    f32→bf16 casts. After the flat update, the new bf16 tree is sliced out
    of one ``master.astype(bf16)`` pass.
  - Gradients arrive as a bf16 tree (cotangent dtype = param dtype); they are
    flattened with a single concat and accumulated into the f32 moments.
    TPU convs accumulate wgrads in f32 internally, so the only rounding is
    the final bf16 store of each gradient — the standard mixed-precision
    recipe (validated for accuracy parity in PARITY.md).

Semantics match ``torch.optim.Adam`` (coupled L2 weight decay added to the
gradient *before* the moment updates, bias correction with step starting at
1) — the reference's optimizer (/root/reference/train.py:62-78). The
learning rate is a traced f32 leaf so the per-epoch schedule
(ops/schedules.py) updates it without retracing.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class FlatAdamState:
    count: jax.Array  # i32 scalar, number of updates applied
    learning_rate: jax.Array  # f32 scalar, schedule-injected
    master: jax.Array  # f32[N] master copy of all params
    mu: jax.Array  # f32[N] first moment
    nu: jax.Array  # f32[N] second moment


def _leaf_spec(tree):
    """Trace-time layout of the arena: (treedef, shapes, sizes, offsets)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = [l.shape for l in leaves]
    sizes = [int(math.prod(s)) for s in shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)
    return treedef, shapes, sizes, offsets[:-1], offsets[-1]


def _flatten_f32(tree) -> jax.Array:
    """Concatenate all leaves, raveled and cast to f32, into one arena."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])


def _unflatten(flat: jax.Array, tree_like) -> Any:
    """Slice the arena back into a tree shaped like ``tree_like``."""
    treedef, shapes, sizes, offsets, total = _leaf_spec(tree_like)
    parts = [
        jax.lax.slice(flat, (o,), (o + s,)).reshape(shape)
        for o, s, shape in zip(offsets, sizes, shapes)
    ]
    return jax.tree_util.tree_unflatten(treedef, parts)


class FlatAdam:
    """Direct-update Adam over flat arenas (not an optax transformation).

    Usage (engine/steps.py ``_finish``):
        opt_state = tx.init(params_f32)
        params = tx.cast_params(params_f32)        # bf16 store
        ...
        new_params, opt_state = tx.apply_grads(grads, opt_state)
    """

    # steps.py dispatches on this attribute to pick the direct-update path.
    direct_update = True

    def __init__(
        self,
        learning_rate: float,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        param_dtype=jnp.bfloat16,
    ):
        self.learning_rate = float(learning_rate)
        self.b1 = float(b1)
        self.b2 = float(b2)
        self.eps = float(eps)
        self.weight_decay = float(weight_decay)
        self.param_dtype = param_dtype

    def init(self, params) -> FlatAdamState:
        master = _flatten_f32(params)
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            learning_rate=jnp.asarray(self.learning_rate, jnp.float32),
            master=master,
            mu=jnp.zeros_like(master),
            nu=jnp.zeros_like(master),
        )

    def cast_params(self, params):
        """The stored (compute-dtype) param tree for the TrainState."""
        return jax.tree.map(lambda p: p.astype(self.param_dtype), params)

    def apply_grads(self, grads, opt_state: FlatAdamState):
        """One Adam step on the arenas; returns (new param tree, new state).

        Does not need the old param tree — the master lives in opt_state —
        so under donation the old params' buffers are free for XLA to reuse.
        """
        g = _flatten_f32(grads)
        master, mu, nu = opt_state.master, opt_state.mu, opt_state.nu
        if self.weight_decay:
            g = g + self.weight_decay * master  # coupled L2, torch-Adam style
        mu = self.b1 * mu + (1.0 - self.b1) * g
        nu = self.b2 * nu + (1.0 - self.b2) * (g * g)
        count = opt_state.count + 1
        t = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - self.b1**t)
        nu_hat = nu / (1.0 - self.b2**t)
        step = opt_state.learning_rate * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
        master = master - step
        new_params = _unflatten(master.astype(self.param_dtype), grads)
        new_state = opt_state.replace(count=count, master=master, mu=mu, nu=nu)
        return new_params, new_state


@struct.dataclass
class TreeAdamState:
    count: jax.Array  # i32 scalar
    learning_rate: jax.Array  # f32 scalar, schedule-injected
    master: Any  # f32 tree, master copy of params
    mu: Any  # f32 tree
    nu: Any  # f32 tree


class TreeAdam:
    """Per-tensor direct-update Adam with bf16 param store.

    Measured tradeoff vs FlatAdam on v5e (see ROADMAP round 2): the big
    wgrad kernels FUSE with their tensor's Adam update when the update is
    per-tensor (XLA multiply_add_fusion: wgrad contraction -> f32 convert ->
    moment update -> bf16 param cast in one pass), which the flat arena
    forbids (wgrad must materialize, then concat). TreeAdam keeps that
    fusion AND the bf16 param store (no f32->bf16 casts in apply), at the
    cost of per-tensor kernels for the ~100 tiny BN params.

    Same torch-Adam semantics as FlatAdam (shared tests).
    """

    direct_update = True

    def __init__(
        self,
        learning_rate: float,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        param_dtype=jnp.bfloat16,
    ):
        self.learning_rate = float(learning_rate)
        self.b1 = float(b1)
        self.b2 = float(b2)
        self.eps = float(eps)
        self.weight_decay = float(weight_decay)
        self.param_dtype = param_dtype

    def init(self, params) -> TreeAdamState:
        # copy=True: when params are already f32 (no-amp runs), a plain astype
        # would alias the param buffers, and donating TrainState would then
        # donate the same buffer twice (params + master).
        master = jax.tree.map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
        )
        zeros = jax.tree.map(jnp.zeros_like, master)
        return TreeAdamState(
            count=jnp.zeros((), jnp.int32),
            learning_rate=jnp.asarray(self.learning_rate, jnp.float32),
            master=master,
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, master),
        )

    def cast_params(self, params):
        return jax.tree.map(lambda p: p.astype(self.param_dtype), params)

    def apply_grads(self, grads, opt_state: TreeAdamState):
        count = opt_state.count + 1
        t = count.astype(jnp.float32)
        c1 = 1.0 - self.b1**t
        c2 = 1.0 - self.b2**t
        lr = opt_state.learning_rate

        def upd(g, m, mu, nu):
            g = g.astype(jnp.float32)
            if self.weight_decay:
                g = g + self.weight_decay * m
            mu = self.b1 * mu + (1.0 - self.b1) * g
            nu = self.b2 * nu + (1.0 - self.b2) * (g * g)
            m = m - lr * (mu / c1) / (jnp.sqrt(nu / c2) + self.eps)
            return m, mu, nu, m.astype(self.param_dtype)

        out = jax.tree.map(upd, grads, opt_state.master, opt_state.mu, opt_state.nu)
        # out is a tree of 4-tuples; split it
        master = jax.tree.map(lambda o: o[0], out, is_leaf=lambda o: isinstance(o, tuple))
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda o: isinstance(o, tuple))
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=lambda o: isinstance(o, tuple))
        new_params = jax.tree.map(
            lambda o: o[3], out, is_leaf=lambda o: isinstance(o, tuple)
        )
        new_state = opt_state.replace(count=count, master=master, mu=mu, nu=nu)
        return new_params, new_state
