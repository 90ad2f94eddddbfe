"""Space-to-depth ("packed") decoder tail — the 512² stage on full MXU lanes.

Problem (measured on v5e, see ROADMAP): the reference decoder's final stage
(unet_resnet.py:70-78 — ×2 upsample, two 3×3 convs at 64 channels, 1×1 class
head, all at 512²) runs at half MXU rate or worse: 64 output channels fill
half of the 128-wide lane dimension (3×3 conv fwd 64 TF/s, the 1×1 head's
backward <1 TF/s), and XLA pads/relayouts the 512² activations (~6 ms/step
of pure copies).

Fix: never materialize 512² at 64 channels. Keep the stage at 256² with the
2×2 sub-pixel phases packed into channels ((p,q,c) order, 4·64 = 256
channels = full lanes):

  - the ×2 bilinear upsample emits packed phases directly from the static
    interpolation matrices (same FLOPs as the unpacked einsum);
  - each 3×3/stride-1 conv at 512² becomes four 2×2 convs at 256² over the
    packed channels, one per output phase (p,q) with padding ((1-p,p),(1-q,q))
    — kernels are re-arrangements of the SAME [3,3,C,O] parameters with
    structural zeros (derivation in ``_phase_kernel``), so the parameter
    tree (and checkpoints) are unchanged. 16/9 the FLOPs at ~2.6× the rate;
  - the 1×1 head is a per-phase channel matmul;
  - ``depth_to_space2`` unpacks to [B,2H,2W,C] only at the very end (the
    logits are tiny: num_classes channels).

Everything is numerically equivalent to the unpacked ops up to dtype
rounding (tests/test_packed_tail.py checks exactness in f32).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops.resize import _interp_matrix


def space_to_depth2(x: jax.Array) -> jax.Array:
    """[B,2H,2W,C] -> [B,H,W,4C] with (p,q,c) channel order."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [b,i,j,p,q,c]
    return x.reshape(b, h, w, 4 * c)


def depth_to_space2(x: jax.Array) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C], inverse of space_to_depth2."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [b,i,p,j,q,c]
    return x.reshape(b, 2 * h, 2 * w, c)


def space_to_depth2_labels(y: jax.Array) -> jax.Array:
    """[B,2H,2W] int labels -> [B,H,W,4] matching packed logits' phases."""
    b, h2, w2 = y.shape
    h, w = h2 // 2, w2 // 2
    y = y.reshape(b, h, 2, w, 2)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(b, h, w, 4)


def packed_upsample2x(x: jax.Array, align_corners: bool = True) -> jax.Array:
    """×2 bilinear upsample of [B,H,W,C], emitted packed as [B,H,W,4C].

    Identical math to ops/resize.upsample2x (same static interpolation
    matrices), but the output rows 2i+p / cols 2j+q land in phase channels
    instead of a 2H×2W layout — no 512²-shaped intermediate exists.
    """
    b, h, w, c = x.shape
    hm = _interp_matrix(h, 2 * h, align_corners).reshape(h, 2, h)  # [i,p,I]
    wm = _interp_matrix(w, 2 * w, align_corners).reshape(w, 2, w)  # [j,q,J]
    hm = jnp.asarray(hm, x.dtype)
    wm = jnp.asarray(wm, x.dtype)
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    t = jnp.einsum("bIJc,jqJ->bIjqc", x, wm, precision=precision)
    u = jnp.einsum("ipI,bIjqc->bijpqc", hm, t, precision=precision)
    return u.reshape(b, h, w, 4 * c)


def _phase_kernel(w: jax.Array, p: int, q: int) -> jax.Array:
    """[3,3,C,O] conv kernel -> the (p,q)-phase packed kernel [2,2,4C,O].

    A stride-1 3×3 conv at 2H×2W:  out[2i+p, 2j+q, o] =
      Σ_{di,dj∈[-1,1]} W[di+1,dj+1,c,o] · in[2i+p+di, 2j+q+dj, c].
    Writing the input row 2i+p+di as 2(i+r)+a with phase a∈{0,1} and packed-
    row offset r, and running the packed conv with kernel taps kr∈{0,1} and
    padding (1-p, p) (so r = kr-(1-p)), the original tap index is
      di = 2·kr + p + a - 2,
    valid iff di∈[-1,1]; the (kr,a) combination outside that range is a
    structural zero. Same for columns with (ks, q, b).
    """
    c, o = w.shape[2], w.shape[3]
    zeros = jnp.zeros((c, o), w.dtype)

    def tap(kr, a, ks, bb):
        di = 2 * kr + p + a - 2
        dj = 2 * ks + q + bb - 2
        if -1 <= di <= 1 and -1 <= dj <= 1:
            return w[di + 1, dj + 1]
        return zeros

    k = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack([tap(kr, a, ks, bb) for bb in (0, 1)], 0)
                            for a in (0, 1)
                        ],
                        0,
                    )
                    for ks in (0, 1)
                ],
                0,
            )
            for kr in (0, 1)
        ],
        0,
    )  # [kr, ks, a, b, C, O]
    return k.reshape(2, 2, 4 * c, o)


def packed_conv3x3(u: jax.Array, w: jax.Array, b: jax.Array | None) -> jax.Array:
    """3×3/s1 conv at 2H×2W, computed on the packed [B,H,W,4C] layout.

    Four 2×2 convs over full-lane channels (one per output phase), exactly
    equivalent to conv3x3 at the unpacked resolution with the same [3,3,C,O]
    params. 16/9 the MACs, ~2.6× the measured MXU rate at C=64.
    """
    outs = []
    for p in (0, 1):
        for q in (0, 1):
            k = _phase_kernel(w, p, q)
            y = jax.lax.conv_general_dilated(
                u,
                k,
                window_strides=(1, 1),
                padding=((1 - p, p), (1 - q, q)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(y)
    y = jnp.stack(outs, axis=-2)  # [B,H,W,4,O]
    if b is not None:
        y = y + b
    bsz, h, wd, _, o = y.shape
    return y.reshape(bsz, h, wd, 4 * o)


def packed_conv1x1(u: jax.Array, w: jax.Array, b: jax.Array | None) -> jax.Array:
    """1×1 conv on the packed layout: per-phase channel matmul.

    ``w`` is the unpacked [1,1,C,O] (or [C,O]) kernel; phases don't mix.
    """
    if w.ndim == 4:
        w = w[0, 0]
    bsz, h, wd, c4 = u.shape
    c = w.shape[0]
    y = jnp.einsum("bhwpc,co->bhwpo", u.reshape(bsz, h, wd, 4, c), w)
    if b is not None:
        y = y + b
    return y.reshape(bsz, h, wd, 4 * w.shape[1])
