"""Spatial resize / pooling primitives for NHWC tensors.

The reference mixes two torch upsampling flavors that differ numerically:
  - ``nn.Upsample(mode="bilinear", align_corners=False)`` (unet_plain.py:36,
    unet_attention.py:41, unet_dualdense.py:53) — half-pixel centers;
  - ``nn.UpsamplingBilinear2d`` (unet_resnet.py:21,71, unet_multitask.py:19,61)
    — align_corners=True.

Both are reproduced here as separable 1-D gathers with *static* index/weight
tables (shapes are static under jit), which XLA fuses into cheap vector code
on the VPU; no dynamic gather is emitted.

Also here: the ResNet stem's quirky ``MaxPool2d(3, stride=2, padding=0,
ceil_mode=True)`` (resnet_backbone.py:131), realized as a reduce_window with
asymmetric -inf padding.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _linear_coords(in_size: int, out_size: int, align_corners: bool):
    """Static (idx0, idx1, w1) tables for 1-D linear interpolation."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    idx0 = np.floor(src).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, in_size - 1)
    w1 = (src - idx0).astype(np.float32)
    return idx0, idx1, w1


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Static (out, in) linear-interpolation matrix (2 nonzeros per row)."""
    idx0, idx1, w1 = _linear_coords(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    m[rows, idx0] += 1.0 - w1
    m[rows, idx1] += w1
    return m


def _interp_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool):
    """1-D linear resize along `axis` as a static-matrix contraction.

    A gather (`jnp.take`) forward costs ~4 ms for 64ch 256->512 on v5e and
    its BACKWARD is a scatter-add (worse); contracting with the static
    interpolation matrix runs on the MXU in both directions. The matrix has
    2 nonzeros/row, so FLOPs are wasted, but MXU FLOPs are ~500x cheaper
    than random HBM access here.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    w = jnp.asarray(_interp_matrix(in_size, out_size, align_corners), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    # f32 inputs keep exact weights; bf16 activations take one MXU pass with
    # f32 accumulation (HIGHEST would triple the passes for <=0.2% of extra
    # mantissa that bf16 AMP doesn't need).
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    out = jnp.einsum("...i,oi->...o", moved, w, precision=precision)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) tensors with torch-compatible modes."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _interp_axis(x, h_axis, out_hw[0], align_corners)
    x = _interp_axis(x, w_axis, out_hw[1], align_corners)
    return x


def upsample2x(x: jax.Array, align_corners: bool = False) -> jax.Array:
    """2x bilinear upsampling of NHWC tensors.

    Lowered as ONE joint 3-operand einsum over both spatial axes. Measured on
    v5e at the model's hottest site (64ch 256^2->512^2, bf16, with a conv
    consumer, fwd+bwd): joint 3.38 ms vs 5.22 ms for sequential per-axis
    contractions — XLA picks contraction order and layouts jointly, removing
    the 1.28 ms relayout copy the sequential form emitted between the H pass
    and the consumer conv. Alternatives measured and rejected: per-parity
    shifted-add interleave (8.7 ms — XLA materializes the interleave
    transposes), per-axis moveaxis einsum (the previous default), and a
    hand-written Pallas kernel (docs/negative-results/pallas_upsample.py:
    per-tile DMA without double buffering loses to the pipelined einsum
    fusions, 1.7 vs 0.5 ms at 128ch@128^2).
    """
    h, w = x.shape[-3], x.shape[-2]
    if x.ndim == 4:
        mh = jnp.asarray(_interp_matrix(h, 2 * h, align_corners), x.dtype)
        mw = jnp.asarray(_interp_matrix(w, 2 * w, align_corners), x.dtype)
        precision = (
            jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        )
        return jnp.einsum("nhwc,oh,pw->nopc", x, mh, mw, precision=precision)
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def max_pool(
    x: jax.Array,
    window: int,
    stride: int,
    padding: int = 0,
    ceil_mode: bool = False,
) -> jax.Array:
    """NHWC max pooling matching ``torch.nn.MaxPool2d`` semantics.

    ceil_mode pads the bottom/right with -inf so trailing partial windows are
    kept (windows that would start inside the padding are not emitted, per
    torch's rule — with padding=0 that never happens for stride<=window).
    """
    h, w = x.shape[-3], x.shape[-2]

    def _pads(size: int) -> tuple[int, int]:
        if ceil_mode:
            out = -(-(size + 2 * padding - window) // stride) + 1
            # torch: the last window must start at or before size + padding - 1
            if (out - 1) * stride >= size + padding:
                out -= 1
        else:
            out = (size + 2 * padding - window) // stride + 1
        pad_hi = max((out - 1) * stride + window - size - padding, padding)
        return padding, pad_hi

    ph, pw = _pads(h), _pads(w)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), ph, pw, (0, 0)),
    )


def center_pad_to(x: jax.Array, target_hw: tuple[int, int]) -> jax.Array:
    """Symmetric zero-pad of NHWC tensor to target H/W (unet_plain.py:42-45)."""
    h, w = x.shape[-3], x.shape[-2]
    dh = target_hw[0] - h
    dw = target_hw[1] - w
    if dh == 0 and dw == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-3] = (dh // 2, dh - dh // 2)
    pad[-2] = (dw // 2, dw - dw // 2)
    return jnp.pad(x, pad)


def adaptive_avg_pool_1x1(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> NC (``AdaptiveAvgPool2d(1)`` + Flatten)."""
    return jnp.mean(x, axis=(-3, -2))
