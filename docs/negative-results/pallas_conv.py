"""Pallas TPU kernel: stride-1 SAME conv3x3 for the decoder tail (C=64).

Why: at the flagship 512^2 b8 bf16 config the decoder's 64-channel 3x3
convs dominate the step. XLA's forward lowering runs at ~72 TF/s (near the
~45% utilization ceiling that C=64 imposes on the 128-lane MXU), but its
auto-generated dgrads run at ~48 TF/s in a W-minor layout whose seams cost
a further 2.5 ms/step of pure relayout copies (ROADMAP.md perf table).
dx of a SAME stride-1 conv3x3 is itself a SAME stride-1 conv3x3 with
spatially-flipped, channel-transposed weights, so ONE kernel serves both
forward and dgrad — and a C-minor-in/C-minor-out kernel removes XLA's
reason to mix layouts.

Structure: grid over (batch, H-blocks), all inputs auto-pipelined by
pallas_call (no manual DMA): the H-halo arrives as two extra single-row
views of x whose index maps address rows b*hb-1 and b*hb+hb (clamped at
the image edge and zeroed in-kernel). Compute is an im2col GEMM per
kernel row: the three W-shifts are VMEM slices concatenated to a
[hb*W, 3C] operand against prepacked [3C, C] weights, f32 accumulation.
Input overfetch is (hb+2)/hb ~= 1.13x.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, top_ref, bot_ref, w_ref, out_ref, *, hb: int, W: int, C: int):
    b = pl.program_id(1)
    nblocks = pl.num_programs(1)

    zero_row = jnp.zeros((1, W, C), cur_ref.dtype)
    top = jnp.where(b == 0, zero_row, top_ref[0])
    bot = jnp.where(b == nblocks - 1, zero_row, bot_ref[0])
    rows = jnp.concatenate([top, cur_ref[0], bot], axis=0)  # [hb+2, W, C]

    acc = jnp.zeros((hb * W, C), jnp.float32)
    for ky in range(3):
        r = rows[ky : ky + hb]  # [hb, W, C]; ky is a Python int (static)
        left = jnp.concatenate([jnp.zeros((hb, 1, C), r.dtype), r[:, :-1]], 1)
        right = jnp.concatenate([r[:, 1:], jnp.zeros((hb, 1, C), r.dtype)], 1)
        a = jnp.concatenate([left, r, right], axis=-1).reshape(hb * W, 3 * C)
        acc = acc + jnp.dot(a, w_ref[ky], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(hb, W, C).astype(out_ref.dtype)


def supports(x_shape, w_shape) -> bool:
    n, h, w, c = x_shape
    kh, kw, ci, co = w_shape
    return (
        kh == 3 and kw == 3 and ci == c and co == c
        and c % 8 == 0 and w % 8 == 0 and h % 16 == 0 and h >= 32
    )


@partial(jax.jit, static_argnames=("hb",))
def conv3x3_same(x: jax.Array, w: jax.Array, hb: int = 16) -> jax.Array:
    """SAME stride-1 conv3x3, NHWC (x) HWIO -> NHWC, f32 accumulation.

    Bias (if any) is the caller's to add — XLA fuses it with the consumer.
    """
    n, H, W, C = x.shape
    assert supports(x.shape, w.shape), (x.shape, w.shape)
    assert H % hb == 0, (H, hb)
    # Prepack [3, 3, C, C] -> [3, 3C, C]: per-ky im2col weights (kx, ci) x co.
    wp = w.astype(x.dtype).reshape(3, 3 * C, C)

    return pl.pallas_call(
        partial(_kernel, hb=hb, W=W, C=C),
        grid=(n, H // hb),
        in_specs=[
            pl.BlockSpec((1, hb, W, C), lambda n, b: (n, b, 0, 0)),
            # Single-row halo views; 1-row blocks let the index map address
            # arbitrary rows (clamped at the edges, zeroed in-kernel).
            pl.BlockSpec(
                (1, 1, W, C),
                lambda n, b: (n, jnp.maximum(b * hb - 1, 0), 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, W, C),
                lambda n, b: (n, jnp.minimum(b * hb + hb, H - 1), 0, 0),
            ),
            pl.BlockSpec((3, 3 * C, C), lambda n, b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, W, C), lambda n, b: (n, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H, W, C), x.dtype),
    )(x, x, x, wp)
