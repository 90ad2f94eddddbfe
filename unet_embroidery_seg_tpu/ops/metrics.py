"""Segmentation metrics as pure, jittable JAX functions.

Parity targets in the PyTorch reference:
  - binary confusion counts + Dice/IoU/Precision/Recall/Accuracy:
      /root/reference/utils/train_and_eval.py:116-152
  - multiclass Pixel Acc / Mean Acc / Mean IoU / FW IoU (per-batch averaged):
      /root/reference/utils/train_and_eval.py:20-103

Unlike the reference, which calls ``.item()`` four times per batch, these
return device arrays so an epoch of evaluation accumulates entirely on the
TPU with a single host transfer at the end.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def np_prod(shape) -> int:
    return math.prod(int(s) for s in shape)


def binary_confusion_counts(
    pred: jax.Array,
    target: jax.Array,
    ignore_index: int | None = None,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Pixel-accumulated (tp, fp, fn, tn) for binary segmentation.

    Args:
        pred: (N, ...) integer predictions in {0, 1}.
        target: same-shape integer targets in {0, 1} (or ignore_index).
        sample_mask: optional (N,) validity mask (padded-batch support).

    Returns:
        int32 array of shape (4,): [tp, fp, fn, tn].
    """
    pred_fg = pred == 1
    target_fg = target == 1
    if ignore_index is not None:
        valid = target != ignore_index
    else:
        valid = jnp.ones_like(target_fg)
    if sample_mask is not None:
        sm = sample_mask.astype(bool).reshape(
            (-1,) + (1,) * (target.ndim - 1)
        )
        valid = valid & sm
    tp = jnp.sum(pred_fg & target_fg & valid)
    fp = jnp.sum(pred_fg & ~target_fg & valid)
    fn = jnp.sum(~pred_fg & target_fg & valid)
    tn = jnp.sum(~pred_fg & ~target_fg & valid)
    return jnp.stack([tp, fp, fn, tn]).astype(jnp.int32)


def binary_metrics_from_counts(
    tp: float, fp: float, fn: float, tn: float, eps: float = 1e-7
) -> dict[str, float]:
    """Dice/IoU/Precision/Recall/Accuracy from global confusion counts.

    Host-side finalization (train_and_eval.py:140-152 semantics, eps=1e-7).
    """
    tp, fp, fn, tn = float(tp), float(fp), float(fn), float(tn)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    dice = (2.0 * tp) / (2.0 * tp + fp + fn + eps)
    iou = tp / (tp + fp + fn + eps)
    accuracy = (tp + tn) / (tp + tn + fp + fn + eps)
    return {
        "Dice": float(dice),
        "IoU": float(iou),
        "Precision": float(precision),
        "Recall": float(recall),
        "Accuracy": float(accuracy),
    }


def _per_class_tables(pred: jax.Array, target: jax.Array, num_classes: int):
    """Per-class (intersection, union, target_count, pred_count) int32 tables."""
    classes = jnp.arange(num_classes)
    t = target[None] == classes.reshape(-1, *([1] * target.ndim))
    p = pred[None] == classes.reshape(-1, *([1] * pred.ndim))
    axes = tuple(range(1, t.ndim))
    inter = jnp.sum(t & p, axis=axes)
    union = jnp.sum(t | p, axis=axes)
    t_cnt = jnp.sum(t, axis=axes)
    p_cnt = jnp.sum(p, axis=axes)
    return inter, union, t_cnt, p_cnt


def multiclass_batch_metrics(
    logits: jax.Array,
    target: jax.Array,
    num_classes: int,
    sample_mask: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """One batch's Pixel Acc / Mean Acc / Mean IoU / FW IoU (f32 scalars).

    Semantics match the reference exactly (train_and_eval.py:20-103):
      - Mean Acc / Mean IoU average only over classes present in the target;
      - FW IoU weights *all* classes' IoUs (0 when union == 0) by frequency;
      - the engine averages these per-batch values over batches, it does NOT
        accumulate a global confusion matrix.

    Args:
        logits: (N, H, W, C) class logits.
        target: (N, H, W) integer labels.
    """
    pred = jnp.argmax(logits, axis=-1)
    if sample_mask is not None:
        # Route invalid samples to out-of-range ids so no class table counts
        # them (and pixel accuracy masks them explicitly below).
        sm = sample_mask.astype(bool).reshape((-1,) + (1,) * (target.ndim - 1))
        pred = jnp.where(sm, pred, -1)
        target = jnp.where(sm, target, -2)
    inter, union, t_cnt, _ = _per_class_tables(pred, target, num_classes)
    inter = inter.astype(jnp.float32)
    union = union.astype(jnp.float32)
    t_cnt = t_cnt.astype(jnp.float32)

    correct = (pred == target).astype(jnp.float32)
    if sample_mask is not None:
        n_valid_pix = jnp.maximum(
            jnp.sum(sample_mask.astype(jnp.float32))
            * float(np_prod(target.shape[1:])),
            1.0,
        )
        pixel_acc = jnp.sum(correct) / n_valid_pix
    else:
        pixel_acc = jnp.mean(correct)

    present = t_cnt > 0
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    acc_per_class = jnp.where(present, inter / jnp.maximum(t_cnt, 1.0), 0.0)
    mean_acc = jnp.sum(acc_per_class) / n_present

    iou_per_class = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    mean_iou = jnp.sum(jnp.where(present, iou_per_class, 0.0)) / n_present

    total = jnp.maximum(jnp.sum(t_cnt), 1.0)
    fw_iou = jnp.sum(t_cnt * iou_per_class) / total

    return {
        "Pixel Accuracy": pixel_acc,
        "Mean Accuracy": mean_acc,
        "Mean IoU": mean_iou,
        "Frequency Weighted IoU": fw_iou,
    }


def multiclass_per_sample_sums(
    logits: jax.Array,
    target: jax.Array,
    num_classes: int,
    sample_mask: jax.Array | None = None,
) -> tuple[dict[str, jax.Array], jax.Array]:
    """Per-SAMPLE multiclass metrics, summed over the batch's valid samples.

    The reference val CLI evaluates with batch_size=1
    (/root/reference/val.py:50-59) and averages the per-batch values of
    train_and_eval.py:480-495 — i.e. a mean of PER-SAMPLE metrics. Averaging
    per-batch values at batch size > 1 is a different statistic (class
    presence is per batch, not per sample), so any batched evaluator that
    wants the reference CLI's number must use these per-sample sums:
    ``metric = sum_over_batches(sums) / sum_over_batches(n_valid)``.

    Returns:
        (dict of summed f32 scalars, n_valid f32 scalar).
    """
    per_sample = jax.vmap(
        lambda lg, tg: multiclass_batch_metrics(lg[None], tg[None], num_classes)
    )(logits, target)
    if sample_mask is None:
        sm = jnp.ones((target.shape[0],), jnp.float32)
    else:
        sm = sample_mask.astype(jnp.float32)
    sums = {k: jnp.sum(v * sm) for k, v in per_sample.items()}
    return sums, jnp.sum(sm)


def multitask_seg_counts(
    seg_logits: jax.Array,
    seg_targets: jax.Array,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Dataset-global [intersection, union, pred_sum, target_sum] for multitask.

    The reference concatenates sigmoid>0.5 predictions across the whole split
    and computes IoU = inter/(union+1e-6), Dice = 2*inter/(psum+tsum+1e-6)
    (train.py:334-351); accumulating these four counts is equivalent.
    """
    pred = (jax.nn.sigmoid(seg_logits[..., 0].astype(jnp.float32)) > 0.5)
    tgt = seg_targets == 1
    if sample_mask is not None:
        sm = sample_mask.astype(bool).reshape((-1,) + (1,) * (tgt.ndim - 1))
        pred = pred & sm
        tgt = tgt & sm
    inter = jnp.sum(pred & tgt)
    union = jnp.sum(pred | tgt)
    psum = jnp.sum(pred)
    tsum = jnp.sum(tgt)
    return jnp.stack([inter, union, psum, tsum]).astype(jnp.int32)


def multitask_seg_metrics_from_counts(
    inter: float, union: float, psum: float, tsum: float
) -> dict[str, float]:
    """IoU/Dice finalization matching train.py:337-340 (eps=1e-6)."""
    iou = float(inter) / (float(union) + 1e-6)
    dice = 2.0 * float(inter) / (float(psum) + float(tsum) + 1e-6)
    return {"IoU": iou, "Dice": dice}
