"""Pallas TPU kernel: 2x bilinear upsampling of NHWC tensors.

Why a kernel: XLA offers two lowerings for per-axis linear interpolation —
gathers (random HBM access: ~4 ms for 64ch 256->512 on v5e, with a
scatter-add backward) or a dense interpolation-matrix contraction
(ops/resize.py: MXU matmul, fast but with 2 nonzeros per matrix row ~256x
of the FLOPs are padding). The op is fundamentally bandwidth-bound — read
34 MB, write 134 MB => ~0.25 ms at v5e HBM speed — and this kernel hits
that bound with pure VPU shifted adds.

Key structure (both torch conventions, exactly 2x):

  out[2i]   = (1-we[i]) * src[i + be] + we[i] * src[i + be + 1]
  out[2i+1] = (1-wo[i]) * src[i + bo] + wo[i] * src[i + bo + 1]

i.e. the source index is AFFINE in the output index with per-parity integer
bases — verified numerically at trace time — while the fractional weights
vary per position when align_corners=True (passed in as vectors). The input
is edge-padded outside the kernel (torch's boundary clamp becomes 0/1
weights against padded rows), so every tile's source slab is one contiguous
DMA.

Mosaic constraints shape the memory plumbing: manual-DMA slices must be
tile-aligned, so (W+2, C) is flattened into one 128-aligned minor axis and
row slabs are fetched at sublane-aligned starts with the residual offset
applied via an in-VMEM dynamic slice.

``upsample2x_pallas`` carries a custom VJP whose backward is the transposed
interpolation-matrix contraction (MXU matmul — no scatters).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_embroidery_seg_tpu.ops.resize import _interp_matrix


def _tables(in_size: int, align_corners: bool):
    """Per-parity (base, weights) for 2x output, in edge-padded coords."""
    out_size = 2 * in_size
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * 0.5 - 0.5
    i = np.arange(in_size, dtype=np.float64)
    bases, weights = [], []
    for parity in (0, 1):
        diffs = src[parity::2] - i
        base = int(np.floor(diffs[len(diffs) // 2]))
        w1 = diffs - base
        if w1.min() < -1e-9 or w1.max() > 1 + 1e-9:
            raise ValueError(
                f"2x upsample index pattern not affine (in={in_size}, "
                f"align_corners={align_corners})"
            )
        bases.append(base + 1)  # +1: top/left edge pad
        weights.append(np.clip(w1, 0.0, 1.0).astype(np.float32))
    return bases, weights


def _kernel(we_h_ref, wo_h_ref, we_w_ref, wo_w_ref, x_hbm, out_ref, slab, sem,
            *, half: int, be_h: int, bo_h: int, be_w: int, bo_w: int,
            w_in: int, c_ch: int, align: int, slab_rows: int):
    i = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    # base_min == 0 and half % sublane-tile == 0 (asserted at trace time), so
    # the DMA start t*half is always tile-aligned and every in-slab offset is
    # a STATIC slice (Mosaic cannot prove dynamic sublane offsets aligned).
    # Column tiles slice the flattened (W+2)*C minor axis: the slab for
    # columns [j*w_in, j*w_in + w_in + 2) is contiguous and lane-aligned
    # because c % 128 == 0.
    start = t * half
    cstart = j * w_in * c_ch
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i, 1), pl.ds(start, slab_rows),
                 pl.ds(cstart, (w_in + 2) * c_ch)],
        slab, sem,
    )
    dma.start()
    dma.wait()
    # compute in f32: bf16 sublane tiling (16,128) rejects the unaligned
    # static slices below; conversion is cheap VPU work
    src = slab[0].astype(jnp.float32)  # (slab_rows, (w_in+2)*c_ch)

    def rows_at(rel: int):
        # static slice, then split the minor axis (free when c % 128 == 0)
        return src[rel : rel + half].reshape(half, w_in + 2, c_ch)

    # Row weights are (half, 1, c): Mosaic supports broadcasting the middle
    # (sublane-adjacent) dim; what it rejects is broadcasting a (half,1,1)
    # vector across BOTH minor dims.
    we_h = we_h_ref[0]  # (half, 1, c_ch)
    wo_h = wo_h_ref[0]
    even_rows = rows_at(be_h) * (1.0 - we_h) + rows_at(be_h + 1) * we_h
    odd_rows = rows_at(bo_h) * (1.0 - wo_h) + rows_at(bo_h + 1) * wo_h
    rows = jnp.stack([even_rows, odd_rows], axis=1).reshape(
        2 * half, w_in + 2, c_ch
    )

    we_w = we_w_ref[:]  # (1, w_in, c_ch) — lane dim carried explicitly
    wo_w = wo_w_ref[:]
    even_cols = (
        rows[:, be_w : be_w + w_in] * (1.0 - we_w)
        + rows[:, be_w + 1 : be_w + 1 + w_in] * we_w
    )
    odd_cols = (
        rows[:, bo_w : bo_w + w_in] * (1.0 - wo_w)
        + rows[:, bo_w + 1 : bo_w + 1 + w_in] * wo_w
    )
    out = jnp.stack([even_cols, odd_cols], axis=2)
    out_ref[0] = out.reshape(2 * half, 2 * w_in, c_ch).astype(out_ref.dtype)


def _forward(x: jax.Array, align_corners: bool) -> jax.Array:
    n, h, w, c = x.shape
    dtype = x.dtype
    (be_h, bo_h), (w1_he, w1_ho) = _tables(h, align_corners)
    (be_w, bo_w), (w1_we, w1_wo) = _tables(w, align_corners)

    align = 8 if dtype == jnp.float32 else 16  # sublane tile for the dtype
    if ((w + 2) * c) % 128 != 0:
        raise ValueError(f"(W+2)*C={(w + 2) * c} not 128-aligned")

    # output tile = 2*half rows; half == sublane alignment keeps every VMEM
    # buffer small (the 128ch@128^2 case overflows VMEM at half=16 f32)
    half = align if h % align == 0 and h >= align else h
    if half % align or min(be_h, bo_h) != 0 or max(be_h, bo_h, be_w, bo_w) > 1:
        raise ValueError(
            f"unsupported tiling: half={half} align={align} bases="
            f"{(be_h, bo_h, be_w, bo_w)}"
        )
    n_tiles = h // half
    # column tiles bound the VMEM footprint for wide/fat tensors (bf16 runs
    # with half=16 and f32 temporaries, so it gets a smaller budget)
    limit = 16 * 1024 if dtype == jnp.float32 else 4 * 1024
    w_tile = w
    while w_tile * c > limit and w_tile % 2 == 0 and w_tile > 4:
        w_tile //= 2
    n_ctiles = w // w_tile
    # slab covers rows [t*half, t*half + half + 2); static offsets 0..2
    slab_rows = ((half + 2 + align - 1) // align) * align

    # edge-pad, then pad rows up so aligned slabs never run off the end
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h_rows = h + 2
    h_pad = ((max(h_rows, slab_rows) + align - 1) // align) * align + align
    xp = jnp.pad(xp, ((0, 0), (0, h_pad - h_rows), (0, 0), (0, 0)), mode="edge")
    if n_ctiles > 1:  # right halo for interior col tiles
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, w_tile - w % w_tile if w % w_tile else 0), (0, 0)), mode="edge")
    xp = xp.reshape(n, h_pad, -1)

    we_h = jnp.asarray(
        np.broadcast_to(w1_he.reshape(n_tiles, half, 1, 1), (n_tiles, half, 1, c)),
        jnp.float32,
    )
    wo_h = jnp.asarray(
        np.broadcast_to(w1_ho.reshape(n_tiles, half, 1, 1), (n_tiles, half, 1, c)),
        jnp.float32,
    )
    we_w = jnp.asarray(
        np.broadcast_to(w1_we.reshape(n_ctiles, w_tile, 1), (n_ctiles, w_tile, c)),
        jnp.float32,
    )
    wo_w = jnp.asarray(
        np.broadcast_to(w1_wo.reshape(n_ctiles, w_tile, 1), (n_ctiles, w_tile, c)),
        jnp.float32,
    )

    return pl.pallas_call(
        partial(
            _kernel, half=half, be_h=be_h, bo_h=bo_h, be_w=be_w, bo_w=bo_w,
            w_in=w_tile, c_ch=c, align=align, slab_rows=slab_rows,
        ),
        grid=(n, n_tiles, n_ctiles),
        in_specs=[
            pl.BlockSpec((1, half, 1, c), lambda i, t, j: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, 1, c), lambda i, t, j: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_tile, c), lambda i, t, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_tile, c), lambda i, t, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # DMA'd per tile
        ],
        out_specs=pl.BlockSpec((1, 2 * half, 2 * w_tile, c),
                               lambda i, t, j: (i, t, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((1, slab_rows, (w_tile + 2) * c), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(we_h, wo_h, we_w, wo_w, xp)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x_pallas(x: jax.Array, align_corners: bool = False) -> jax.Array:
    """2x bilinear NHWC upsample (Pallas forward, matmul-transpose backward)."""
    return _forward(x, align_corners)


def _fwd(x, align_corners):
    return _forward(x, align_corners), x.shape


def _bwd(align_corners, in_shape, g):
    n, h, w, c = in_shape
    mh = jnp.asarray(_interp_matrix(h, 2 * h, align_corners), g.dtype)
    mw = jnp.asarray(_interp_matrix(w, 2 * w, align_corners), g.dtype)
    prec = jax.lax.Precision.HIGHEST if g.dtype == jnp.float32 else None
    g = jnp.einsum("oi,nowc->niwc", mh, g, precision=prec)
    g = jnp.einsum("oi,nhoc->nhic", mw, g, precision=prec)
    return (g,)


upsample2x_pallas.defvjp(_fwd, _bwd)


def supports(x) -> bool:
    """Whether the kernel handles this shape/dtype (else fall back).

    C must be lane-aligned (C % 128 == 0): for smaller C the in-kernel
    unflatten of the (W+2)*C minor axis is a relayout Mosaic rejects. H must
    admit a sublane-aligned row tile.
    """
    if x.ndim != 4 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    n, h, w, c = x.shape
    align = 8 if x.dtype == jnp.float32 else 16
    return c % 128 == 0 and h % align == 0 and w >= 2
