"""Segmentation losses as pure, jittable JAX functions (NHWC layouts).

Behavioral parity targets (semantics, not code) in the PyTorch reference:
  - BCE-with-logits (+pos_weight):   /root/reference/model/unet_training.py:205-216
  - Lovasz-hinge:                    /root/reference/model/unet_training.py:219-280
  - CE / Focal / Dice (+ignore):     /root/reference/model/unet_training.py:9-91
  - binary 2-class-logit convention: /root/reference/utils/train_and_eval.py:106-113
  - multitask seg+cls loss:          /root/reference/model/unet_multitask.py:109-139

Everything here runs on device under jit: the Lovasz sort uses XLA's bitonic
sort (vmapped per image), and no function ever forces a host sync.
All reductions are carried out in float32 regardless of the compute dtype
of the incoming logits (the bf16 AMP analogue keeps losses exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_logits_from_two_class(outputs: jax.Array) -> jax.Array:
    """Collapse 2-class logits (N, H, W, 2) to binary logits (N, H, W).

    softmax(outputs)[..., 1] == sigmoid(outputs[..., 1] - outputs[..., 0]),
    mirroring the reference convention (train_and_eval.py:106-113) in NHWC.
    A 3-dim input is an already-collapsed difference (a ``diff_head`` model,
    blocks.ClassHead) and passes through unchanged.
    """
    if outputs.ndim == 3:
        return outputs
    if outputs.ndim != 4 or outputs.shape[-1] != 2:
        raise ValueError(f"Expected outputs shape (N,H,W,2), got {outputs.shape}")
    return outputs[..., 1] - outputs[..., 0]


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: jax.Array | float | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable binary cross entropy with logits.

    Matches ``F.binary_cross_entropy_with_logits`` (mean reduction):
      loss = -[ w_p * z * log(sigmoid(x)) + (1 - z) * log(1 - sigmoid(x)) ]

    Args:
        logits: arbitrary-shape float logits.
        targets: same-shape 0/1 targets.
        pos_weight: optional scalar weight on the positive term (neg/pos).
        mask: optional same-shape 0/1 validity mask; the mean is taken over
            valid elements only (used for ignore_index support).
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    # log(sigmoid(x)) = -softplus(-x);  log(1-sigmoid(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-x)
    log_not_p = -jax.nn.softplus(x)
    if pos_weight is not None:
        pw = jnp.asarray(pos_weight, dtype=jnp.float32)
        per_elem = -(pw * z * log_p + (1.0 - z) * log_not_p)
    else:
        per_elem = -(z * log_p + (1.0 - z) * log_not_p)
    if mask is not None:
        # Broadcast before normalizing: a (N,1,1) per-sample mask must count
        # every pixel of a valid sample in the denominator.
        m = jnp.broadcast_to(mask.astype(jnp.float32), per_elem.shape)
        return jnp.sum(per_elem * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(per_elem)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors.

    cumsum-based Jaccard gradient (arXiv:1705.08790); the reference computes
    the same quantity with torch cumsum (unet_training.py:219-230).
    """
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    # jaccard[1:] -= jaccard[:-1]; jaccard[0] unchanged.
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@jax.custom_vjp
def _lovasz_errors_loss(errors: jax.Array, labels: jax.Array) -> jax.Array:
    """(N,) per-image Lovasz losses from hinge errors (N, P), labels (N, P).

    TPU-native formulation: everything is batched ``lax.sort`` — no argsort
    gathers and no scatters anywhere. A (8, 262144) descending multi-operand
    sort runs in ~3.5 ms on v5e where argsort + two take_along_axis gathers
    take ~50 ms (random access is the expensive part, not the sort network).
    The backward pass "un-sorts" the sorted-coefficient vector with a second
    sort keyed on the forward permutation (sort-by-perm == inverse permute),
    so the VJP is also gather/scatter-free.
    """
    per_image, _ = _lovasz_fwd_impl(errors, labels)
    return per_image


def _lovasz_fwd_impl(errors, labels):
    p = errors.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, errors.shape, 1)
    neg_sorted, gt_sorted, perm = jax.lax.sort(
        (-errors, labels, iota), dimension=1, num_keys=1
    )
    errors_sorted = -neg_sorted
    gts = jnp.sum(gt_sorted, axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=1)
    jaccard = 1.0 - intersection / union
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1
    )
    per_image = jnp.sum(jax.nn.relu(errors_sorted) * grad, axis=1)
    # d per_image / d errors_sorted = 1{errors_sorted > 0} * grad
    coeff_sorted = jnp.where(errors_sorted > 0, grad, 0.0)
    return per_image, (coeff_sorted, perm)


def _lovasz_bwd_impl(res, gbar):
    coeff_sorted, perm = res
    # inverse-permute by sorting on the forward permutation indices
    _, coeff = jax.lax.sort((perm, coeff_sorted), dimension=1, num_keys=1)
    return gbar[:, None] * coeff, None


_lovasz_errors_loss.defvjp(_lovasz_fwd_impl, _lovasz_bwd_impl)


def _lovasz_hinge_flat(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Binary Lovasz hinge on flat (P,) logits and {0,1} labels."""
    return lovasz_hinge_per_image(logits[None], labels[None])[0]


def lovasz_hinge_per_image(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(N,) per-image Lovasz-hinge losses (batched descending sort)."""
    n = logits.shape[0]
    flat_logits = logits.reshape(n, -1).astype(jnp.float32)
    flat_labels = labels.reshape(n, -1).astype(jnp.float32)
    signs = 2.0 * flat_labels - 1.0
    errors = 1.0 - flat_logits * signs
    return _lovasz_errors_loss(errors, flat_labels)


def lovasz_hinge(
    logits: jax.Array, labels: jax.Array, sample_mask: jax.Array | None = None
) -> jax.Array:
    """Lovasz-hinge loss for binary segmentation.

    Args:
        logits: (N, H, W) or (H, W) logits.
        labels: same-shape {0,1} labels.
        sample_mask: optional (N,) 0/1 validity weights — the mean is taken
            over valid images only (used to neutralize padded tail batches).

    The per-image losses are averaged, matching the reference's per-image
    loop + mean (unet_training.py:267-280) — but vmapped so the whole batch
    sorts in one fused XLA op instead of a Python loop.
    """
    if logits.ndim == 2:
        logits = logits[None]
        labels = labels[None]
    per_image = lovasz_hinge_per_image(logits, labels)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)
        return jnp.sum(per_image * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(per_image)


def binary_segmentation_loss(
    outputs: jax.Array,
    targets: jax.Array,
    loss_name: str,
    pos_weight: jax.Array | float | None = None,
    ignore_index: int | None = None,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Binary segmentation loss on 2-class logits (N, H, W, 2).

    Dispatches to BCE / Lovasz-hinge exactly like the reference engine
    (train_and_eval.py:155-182). ``ignore_index`` masks pixels for BCE; for
    Lovasz (which needs static shapes on TPU) ignored pixels are neutralized
    by forcing their label to the prediction's sign (zero hinge error).
    """
    logits = binary_logits_from_two_class(outputs).astype(jnp.float32)
    labels = (targets == 1).astype(jnp.float32)

    if loss_name == "bce":
        mask = None
        if ignore_index is not None:
            mask = (targets != ignore_index).astype(jnp.float32)
        if sample_mask is not None:
            sm = sample_mask.astype(jnp.float32)[:, None, None]
            mask = sm if mask is None else mask * sm
        return bce_with_logits(logits, labels, pos_weight=pos_weight, mask=mask)
    if loss_name == "lovasz_hinge":
        if ignore_index is not None:
            valid = targets != ignore_index
            # APPROXIMATE neutralization, and UNUSED on every current call
            # path (binary callers always pass ignore_index=None, same as the
            # reference): setting label to the sign of the logit and boosting
            # the logit magnitude keeps static shapes while the constant
            # hinge error sorts last and gets ~0 Lovasz gradient weight.
            # Exact masking needs dynamic shapes. Anyone adding a caller with
            # ignore_index should validate the approximation first.
            # Both forced values key on the SAME predicate (logits >= 0) so
            # the forced label always matches the forced logit's sign: hinge
            # error 1 - 1e3 = -999 sorts last with zero relu contribution. A
            # mismatched predicate at logit == 0 would give error 1 + 1e3,
            # sorting FIRST with the maximum Lovasz gradient weight.
            pos = logits >= 0
            labels = jnp.where(valid, labels, pos.astype(jnp.float32))
            logits = jnp.where(valid, logits, jnp.where(pos, 1e3, -1e3))
        return lovasz_hinge(logits, labels, sample_mask=sample_mask)
    raise ValueError(f"Unsupported loss_name: {loss_name}")


def ce_loss(
    logits: jax.Array,
    target: jax.Array,
    cls_weights: jax.Array | None = None,
    num_classes: int = 21,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Pixel cross-entropy with ignore_index == num_classes.

    Matches ``CE_Loss`` (unet_training.py:9-24): NHWC logits flattened to
    (N*H*W, C), weighted mean over non-ignored pixels (torch semantics:
    sum(w[t_i] * loss_i) / sum(w[t_i]) over valid i).
    """
    n = logits.shape[0]
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_target = target.reshape(-1)
    valid = flat_target != num_classes
    if sample_mask is not None:
        per_pix = target.reshape(n, -1).shape[1]
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_pix)
    safe_target = jnp.where(valid, flat_target, 0)
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_target[:, None], axis=-1)[:, 0]
    if cls_weights is None:
        w = jnp.ones((c,), jnp.float32)
    else:
        w = jnp.asarray(cls_weights, jnp.float32)
    pix_w = jnp.take(w, safe_target) * valid.astype(jnp.float32)
    return jnp.sum(nll * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    cls_weights: jax.Array | None = None,
    num_classes: int = 21,
    alpha: float = 0.5,
    gamma: float = 2.0,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Focal loss on top of per-pixel CE (unet_training.py:32-59).

    The reference computes per-pixel CE with reduction='none' (ignored pixels
    contribute 0) and then takes the mean over *all* pixels — replicated
    here. With ``sample_mask`` the mean denominator is the pixel count of
    valid samples (i.e. exactly what the reference would see on the
    unpadded partial batch).
    """
    n = logits.shape[0]
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_target = target.reshape(-1)
    valid = flat_target != num_classes
    per_pix = target.reshape(n, -1).shape[1]
    if sample_mask is not None:
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_pix)
    safe_target = jnp.where(valid, flat_target, 0)
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_target[:, None], axis=-1)[:, 0]
    if cls_weights is None:
        w = jnp.ones((c,), jnp.float32)
    else:
        w = jnp.asarray(cls_weights, jnp.float32)
    pix_w = jnp.take(w, safe_target)
    ce = nll * pix_w * valid.astype(jnp.float32)  # reduction='none' CE
    logpt = -ce
    pt = jnp.exp(logpt)
    logpt = logpt * alpha
    loss = -((1.0 - pt) ** gamma) * logpt
    if sample_mask is not None:
        denom = jnp.maximum(jnp.sum(sample_mask.astype(jnp.float32)) * per_pix, 1.0)
        # padded samples have valid=False -> ce=0 -> pt=1 -> loss=0 exactly,
        # so only the denominator needs correcting.
        return jnp.sum(loss) / denom
    return jnp.mean(loss)


def dice_loss(
    logits: jax.Array,
    target_onehot: jax.Array,
    beta: float = 1.0,
    smooth: float = 1e-5,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Soft Dice loss over softmax probabilities (unet_training.py:67-91).

    Args:
        logits: (N, H, W, C) class logits.
        target_onehot: (N, H, W, C+1) one-hot labels where the final channel
            is the ignore class (dropped from tp/fn like the reference's
            ``temp_target[..., :-1]``).
    """
    n, h, w, c = logits.shape
    probs = jax.nn.softmax(logits.reshape(n, -1, c).astype(jnp.float32), axis=-1)
    tgt = target_onehot.reshape(n, -1, target_onehot.shape[-1]).astype(jnp.float32)
    if sample_mask is not None:
        sm = sample_mask.astype(jnp.float32)[:, None, None]
        probs = probs * sm
        tgt = tgt * sm
    tgt_fg = tgt[..., :-1]
    tp = jnp.sum(tgt_fg * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(tgt_fg, axis=(0, 1)) - tp
    b2 = beta**2
    score = ((1 + b2) * tp + smooth) / ((1 + b2) * tp + b2 * fn + fp + smooth)
    return 1.0 - jnp.mean(score)


def multitask_loss(
    seg_logits: jax.Array,
    cls_logits: jax.Array,
    seg_targets: jax.Array,
    cls_targets: jax.Array,
    seg_loss_name: str = "bce",
    cls_loss_weight: float = 1.0,
    sample_mask: jax.Array | None = None,
    pos_weight: jax.Array | float | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Multitask seg+cls loss (unet_multitask.py:109-139).

    Args:
        seg_logits: (N, H, W, 1) binary seg logits (1-channel head).
        cls_logits: (N, num_cls) classification logits.
        seg_targets: (N, H, W) {0,1} masks.
        cls_targets: (N,) int class labels.
        pos_weight: optional positive-term weight on the seg BCE. The
            reference never weights its multitask seg BCE
            (unet_multitask.py:109-139), and the unweighted loss has a
            measured trivial all-background attractor that traps some
            seeds for 10+ epochs (PARITY.md "scaled multitask") — this
            opt-in escape hatch is OFF by default for parity.

    Returns:
        (total_loss, seg_loss, cls_loss)
    """
    seg_flat = seg_logits[..., 0]
    pix_mask = None
    if sample_mask is not None:
        pix_mask = jnp.broadcast_to(
            sample_mask.astype(jnp.float32)[:, None, None], seg_flat.shape
        )
    if seg_loss_name == "lovasz_hinge":
        seg_l = lovasz_hinge(
            seg_flat, seg_targets.astype(jnp.float32), sample_mask=sample_mask
        )
    else:  # "bce" and any other name fall back to BCE, like the reference
        seg_l = bce_with_logits(
            seg_flat, seg_targets.astype(jnp.float32),
            pos_weight=pos_weight, mask=pix_mask,
        )
    log_probs = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    per_sample_nll = -jnp.take_along_axis(log_probs, cls_targets[:, None], axis=-1)[:, 0]
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)
        cls_l = jnp.sum(per_sample_nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        cls_l = jnp.mean(per_sample_nll)
    return seg_l + cls_loss_weight * cls_l, seg_l, cls_l
