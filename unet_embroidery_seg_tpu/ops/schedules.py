"""Learning-rate schedules and optimizer construction.

Parity target: the YOLOX warm-cos / step schedules and per-epoch LR setting in
/root/reference/model/unet_training.py:116-199 and the Adam + batch-scaled LR
clamping in /root/reference/train.py:62-78.

The schedule is *epoch-indexed* (the reference calls ``set_optimizer_lr`` once
per epoch). We keep that exact semantic: the schedule is a pure python
function epoch -> lr, and the engine injects the value into the optax
hyperparams between epochs — no recompilation, since the LR is a traced leaf
of the optimizer state.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import optax


def yolox_warm_cos_lr(
    lr: float,
    min_lr: float,
    total_iters: int,
    warmup_total_iters: float,
    warmup_lr_start: float,
    no_aug_iter: float,
    iters: float,
) -> float:
    """Quadratic warmup -> cosine decay -> min-LR floor (epoch-indexed)."""
    if iters <= warmup_total_iters:
        return (lr - warmup_lr_start) * pow(
            iters / float(warmup_total_iters), 2
        ) + warmup_lr_start
    if iters >= total_iters - no_aug_iter:
        return min_lr
    return min_lr + 0.5 * (lr - min_lr) * (
        1.0
        + math.cos(
            math.pi
            * (iters - warmup_total_iters)
            / (total_iters - warmup_total_iters - no_aug_iter)
        )
    )


def step_lr(lr: float, decay_rate: float, step_size: float, iters: float) -> float:
    """Geometric step decay."""
    if step_size < 1:
        raise ValueError("step_size must above 1.")
    n = iters // step_size
    return lr * decay_rate**n


def get_lr_scheduler(
    lr_decay_type: str,
    lr: float,
    min_lr: float,
    total_iters: int,
    warmup_iters_ratio: float = 0.05,
    warmup_lr_ratio: float = 0.1,
    no_aug_iter_ratio: float = 0.05,
    step_num: int = 10,
) -> Callable[[float], float]:
    """Build the epoch->lr function with the reference's clamping rules."""
    if lr_decay_type == "cos":
        warmup_total_iters = min(max(warmup_iters_ratio * total_iters, 1), 3)
        warmup_lr_start = max(warmup_lr_ratio * lr, 1e-6)
        no_aug_iter = min(max(no_aug_iter_ratio * total_iters, 1), 15)
        return partial(
            yolox_warm_cos_lr,
            lr,
            min_lr,
            total_iters,
            warmup_total_iters,
            warmup_lr_start,
            no_aug_iter,
        )
    decay_rate = (min_lr / lr) ** (1 / (step_num - 1))
    step_size = total_iters / step_num
    return partial(step_lr, lr, decay_rate, step_size)


def resolve_init_lrs(batch_size: int, init_lr: float = 1e-4) -> tuple[float, float]:
    """Batch-size-scaled init/min LR with the reference's clamps.

    train.py:62-78: nbs=16, lr_limit_max=lr_limit_min=1e-4 (so Init_lr_fit is
    pinned to 1e-4 for any batch size); Min_lr_fit clamps to [1e-6, 1e-6]*...
    """
    min_lr = init_lr * 0.01
    nbs = 16
    lr_limit_max = 1e-4
    lr_limit_min = 1e-4
    init_lr_fit = min(max(batch_size / nbs * init_lr, lr_limit_min), lr_limit_max)
    min_lr_fit = min(
        max(batch_size / nbs * min_lr, lr_limit_min * 1e-2), lr_limit_max * 1e-2
    )
    return init_lr_fit, min_lr_fit


def make_optimizer(
    learning_rate: float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """Adam with coupled L2 weight decay, matching ``torch.optim.Adam``.

    torch Adam applies weight decay as grad += wd * param *before* the moment
    updates (coupled L2, not AdamW), so the decay term goes through
    ``add_decayed_weights`` ahead of ``scale_by_adam``. The learning rate is
    injected as a mutable hyperparameter so the per-epoch schedule can update
    it without retracing.
    """

    def _tx(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(b1=momentum, b2=0.999, eps=1e-8))
        chain.append(optax.scale(-1.0))
        chain.append(optax.scale(learning_rate))
        # NOTE: optax.flatten was tried here to fuse the 176 per-tensor Adam
        # fusions (12.7 ms/step) into one kernel — the ravel/unravel copies
        # made the step 6 ms SLOWER on v5e. Keep the per-tensor update.
        return optax.chain(*chain)

    return optax.inject_hyperparams(_tx)(learning_rate=learning_rate)


def make_train_optimizer(
    learning_rate: float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    param_dtype=None,
    variant: str = "tree",
):
    """Direct-update Adam with bf16 param store — the training default.

    Same torch-Adam semantics as ``make_optimizer`` (verified equivalent in
    tests/test_flat_adam.py), but params are stored in the compute dtype so
    ``model.apply`` never casts, and the f32 master lives in the optimizer
    state. Two layouts, both measured on v5e (512² b8 unet_resnet50 step):

      - ``tree`` (default, 64.1 ms): per-tensor update; XLA fuses each big
        wgrad contraction with its tensor's Adam math in one pass.
      - ``flat`` (68.6 ms): one f32 arena per moment; fewer kernels but the
        wgrads must materialize for the gradient concat, losing the fusion.
      - ``optax`` (63.5 ms): the f32-master optax chain (make_optimizer),
        kept for comparison.
    """
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.ops.flat_adam import FlatAdam, TreeAdam

    if variant == "optax":
        return make_optimizer(learning_rate, momentum, weight_decay)
    cls = {"tree": TreeAdam, "flat": FlatAdam}[variant]
    return cls(
        learning_rate,
        b1=momentum,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
        param_dtype=param_dtype if param_dtype is not None else jnp.bfloat16,
    )


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place-functionally (per epoch)."""
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.ops.flat_adam import FlatAdamState, TreeAdamState

    if isinstance(opt_state, (FlatAdamState, TreeAdamState)):
        return opt_state.replace(learning_rate=jnp.asarray(lr, jnp.float32))
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state
