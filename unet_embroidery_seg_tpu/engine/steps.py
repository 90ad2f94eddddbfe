"""Jitted train/eval step factories for the three task modes.

The TPU-native replacement for the reference engine
(/root/reference/utils/train_and_eval.py:185-513 and the inline multitask
loops in train.py:225-355): each step is a pure function of (state, batch)
compiled once per shape, with

  - donated state (no HBM double-buffering of params/optimizer),
  - bf16 compute via the model's ``dtype`` (the GradScaler-free AMP analogue
    — bf16 has the f32 exponent range, so no loss scaling is needed),
  - device-side one-hot/metric computation (no per-batch ``.item()`` syncs;
    the epoch loop only transfers scalars it immediately prints),
  - a ``sample_mask`` input that neutralizes padded tail batches so static
    shapes never change (one compile per run).

Under a sharded batch (parallel/mesh.py) the same jitted function runs SPMD:
GSPMD inserts the gradient psum over the data axis and conv halo exchanges
over the space axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.engine.state import TrainState
from unet_embroidery_seg_tpu.ops import losses, metrics


def _apply_train(model, state: TrainState, images, rng):
    variables = state.variables
    mutable = ["batch_stats"] if state.batch_stats else []
    out = model.apply(
        variables, images, train=True, mutable=mutable, rngs={"dropout": rng}
    )
    if mutable:
        outputs, updates = out
        return outputs, updates.get("batch_stats", state.batch_stats)
    return out, state.batch_stats


def _finish(state: TrainState, tx, grads, new_batch_stats) -> TrainState:
    if getattr(tx, "direct_update", False):
        # FlatAdam path (ops/flat_adam.py): one fused update over flat f32
        # arenas, producing the new compute-dtype param tree directly.
        new_params, new_opt_state = tx.apply_grads(grads, state.opt_state)
    else:
        import optax

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )


def make_binary_train_step(
    model,
    tx,
    loss_name: str,
    pos_weight: float | None = None,
    ignore_index: int | None = None,
) -> Callable:
    """train_step(state, images, pngs, sample_mask, rng) -> (state, loss)."""

    def loss_fn(params, state, images, pngs, sample_mask, rng):
        outputs, new_bs = _apply_train(model, state.replace(params=params), images, rng)
        loss = losses.binary_segmentation_loss(
            outputs,
            pngs,
            loss_name=loss_name,
            pos_weight=pos_weight,
            ignore_index=ignore_index,
            sample_mask=sample_mask,
        )
        return loss, new_bs

    @partial(jax.jit, donate_argnums=0)
    def train_step(state, images, pngs, sample_mask, rng):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, images, pngs, sample_mask, rng
        )
        return _finish(state, tx, grads, new_bs), loss

    return train_step


def make_binary_eval_step(
    model,
    loss_name: str,
    pos_weight: float | None = None,
    ignore_index: int | None = None,
) -> Callable:
    """eval_step(state, images, pngs, sample_mask) -> (loss, counts[4])."""

    @jax.jit
    def eval_step(state, images, pngs, sample_mask):
        outputs = model.apply(state.variables, images, train=False)
        loss = losses.binary_segmentation_loss(
            outputs,
            pngs,
            loss_name=loss_name,
            pos_weight=pos_weight,
            ignore_index=ignore_index,
            sample_mask=sample_mask,
        )
        if outputs.ndim == 3:  # diff_head model: argmax == (diff > 0)
            pred = (outputs > 0).astype(jnp.int32)
        else:
            pred = jnp.argmax(outputs, axis=-1)
        counts = metrics.binary_confusion_counts(
            pred, pngs, ignore_index=ignore_index, sample_mask=sample_mask
        )
        return loss, counts

    return eval_step


def make_multiclass_train_step(
    model,
    tx,
    num_classes: int,
    focal: bool = False,
    use_dice: bool = True,
) -> Callable:
    """Multiclass CE/Focal (+Dice) train step (train_and_eval.py:308-409)."""

    def loss_fn(params, state, images, pngs, sample_mask, rng):
        outputs, new_bs = _apply_train(model, state.replace(params=params), images, rng)
        if focal:
            loss = losses.focal_loss(
                outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
            )
        else:
            loss = losses.ce_loss(
                outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
            )
        if use_dice:
            onehot = jax.nn.one_hot(pngs, num_classes + 1, dtype=jnp.float32)
            loss = loss + losses.dice_loss(outputs, onehot, sample_mask=sample_mask)
        return loss, new_bs

    @partial(jax.jit, donate_argnums=0)
    def train_step(state, images, pngs, sample_mask, rng):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, images, pngs, sample_mask, rng
        )
        return _finish(state, tx, grads, new_bs), loss

    return train_step


def make_multiclass_eval_step(
    model, num_classes: int, focal: bool = False, use_dice: bool = True
) -> Callable:
    """eval_step -> (loss, {PA, MPA, mIoU, FWIoU}) per batch (ref semantics:
    the engine averages these per-batch values, train_and_eval.py:480-495)."""

    @jax.jit
    def eval_step(state, images, pngs, sample_mask):
        outputs = model.apply(state.variables, images, train=False)
        if focal:
            loss = losses.focal_loss(
                outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
            )
        else:
            loss = losses.ce_loss(
                outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
            )
        if use_dice:
            onehot = jax.nn.one_hot(pngs, num_classes + 1, dtype=jnp.float32)
            loss = loss + losses.dice_loss(outputs, onehot, sample_mask=sample_mask)
        m = metrics.multiclass_batch_metrics(
            outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
        )
        return loss, m

    return eval_step


def make_multiclass_persample_eval_step(
    model, num_classes: int, focal: bool = False, use_dice: bool = True
) -> Callable:
    """eval_step -> (loss_sum, metric_sums, n_valid) with PER-SAMPLE metrics.

    Matches the reference val CLI's statistic (batch_size=1 loop,
    /root/reference/val.py:50-59 + train_and_eval.py:480-495) at any batch
    size: the caller divides summed metrics (and the sample-weighted loss
    sum) by the summed n_valid.
    """

    @jax.jit
    def eval_step(state, images, pngs, sample_mask):
        outputs = model.apply(state.variables, images, train=False)

        def per_sample_loss(lg, tg):
            if focal:
                loss = losses.focal_loss(lg[None], tg[None], num_classes=num_classes)
            else:
                loss = losses.ce_loss(lg[None], tg[None], num_classes=num_classes)
            if use_dice:
                onehot = jax.nn.one_hot(tg[None], num_classes + 1, dtype=jnp.float32)
                loss = loss + losses.dice_loss(lg[None], onehot)
            return loss

        sm = sample_mask.astype(jnp.float32)
        loss_sum = jnp.sum(jax.vmap(per_sample_loss)(outputs, pngs) * sm)
        sums, n_valid = metrics.multiclass_per_sample_sums(
            outputs, pngs, num_classes=num_classes, sample_mask=sample_mask
        )
        return loss_sum, sums, n_valid

    return eval_step


def make_multitask_train_step(
    model,
    tx,
    seg_loss_name: str = "bce",
    cls_loss_weight: float = 1.0,
    pos_weight: float | None = None,
) -> Callable:
    """train_step(state, images, pngs, cls, sample_mask, rng)
    -> (state, (total, seg, cls), n_cls_correct).

    ``pos_weight`` weights the seg-BCE positive term; None (the default)
    matches the reference's unweighted multitask loss.
    """

    def loss_fn(params, state, images, pngs, cls_targets, sample_mask, rng):
        (seg_logits, cls_logits), new_bs = _apply_train(
            model, state.replace(params=params), images, rng
        )
        total, seg_l, cls_l = losses.multitask_loss(
            seg_logits,
            cls_logits,
            pngs,
            cls_targets,
            seg_loss_name=seg_loss_name,
            cls_loss_weight=cls_loss_weight,
            sample_mask=sample_mask,
            pos_weight=pos_weight,
        )
        correct = jnp.sum(
            (jnp.argmax(cls_logits, -1) == cls_targets) & sample_mask.astype(bool)
        )
        return total, (new_bs, seg_l, cls_l, correct)

    @partial(jax.jit, donate_argnums=0)
    def train_step(state, images, pngs, cls_targets, sample_mask, rng):
        (total, (new_bs, seg_l, cls_l, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, images, pngs, cls_targets, sample_mask, rng)
        return _finish(state, tx, grads, new_bs), (total, seg_l, cls_l), correct

    return train_step


def make_multitask_eval_step(
    model,
    seg_loss_name: str = "bce",
    cls_loss_weight: float = 1.0,
    num_cls_classes: int = 3,
    pos_weight: float | None = None,
) -> Callable:
    """eval_step -> ((total, seg, cls), seg_counts[4], cls_confusion[C,C])."""

    @jax.jit
    def eval_step(state, images, pngs, cls_targets, sample_mask):
        seg_logits, cls_logits = model.apply(state.variables, images, train=False)
        loss_triple = losses.multitask_loss(
            seg_logits,
            cls_logits,
            pngs,
            cls_targets,
            seg_loss_name=seg_loss_name,
            cls_loss_weight=cls_loss_weight,
            sample_mask=sample_mask,
            pos_weight=pos_weight,
        )
        seg_counts = metrics.multitask_seg_counts(
            seg_logits, pngs, sample_mask=sample_mask
        )
        pred = jnp.argmax(cls_logits, -1)
        valid = sample_mask.astype(bool)
        onehot_pred = jax.nn.one_hot(pred, num_cls_classes, dtype=jnp.int32)
        onehot_tgt = jax.nn.one_hot(cls_targets, num_cls_classes, dtype=jnp.int32)
        confusion = jnp.einsum(
            "ni,nj->ij", onehot_tgt * valid[:, None].astype(jnp.int32), onehot_pred
        )
        return loss_triple, seg_counts, confusion

    return eval_step


def make_predict_fn(model) -> Callable:
    """predict(variables, images) -> logits (inference forward, eval BN)."""

    @jax.jit
    def predict(variables: dict[str, Any], images):
        return model.apply(variables, images, train=False)

    return predict
