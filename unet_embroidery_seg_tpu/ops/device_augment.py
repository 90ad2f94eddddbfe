"""Batched on-device training augmentation (the zero-host-cost input path).

The reference augments every sample on the host with PIL/cv2
(/root/reference/utils/hf_dataloader.py:111-180) — ~18 ms/image single-core,
which caps training at ~56 img/s on this host while the TPU step runs at
~95 img/s. This module reproduces the same augmentation *distribution* as a
jitted, batched program on the TPU:

  host (once per run):   decode + aspect-preserving letterbox onto a fixed
                         uint8 canvas (data/cache.py)
  device (every batch):  aspect jitter (ratio of two U(1-j,1+j)), scale
                         U(0.25,2), h-flip p=.5, random placement, bilinear
                         (image) / nearest (mask) affine resample, HSV jitter
                         (hue .1, sat .7, val .3, cv2 LUT convention)

Statistical parity (not bit parity) with the host path is the contract —
the resample goes through the letterboxed canvas (one extra interpolation)
and HSV math is float where cv2 uses uint8 LUTs; SURVEY.md §7 "hard parts"
(2) calls for metric parity ±0.5%, which tests/test_device_augment.py
checks distributionally.

Everything is separable gathers + elementwise math: XLA fuses it into a few
VPU loops; there is no host sync and no recompile (static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sample_params(key: jax.Array, n: int, jitter: float, hue: float,
                   sat: float, val: float):
    """Per-sample augmentation parameters, one key per batch."""
    ks = jax.random.split(key, 8)
    u = partial(jax.random.uniform, shape=(n,), dtype=jnp.float32)
    ar_a = u(ks[0], minval=1 - jitter, maxval=1 + jitter)
    ar_b = u(ks[1], minval=1 - jitter, maxval=1 + jitter)
    scale = u(ks[2], minval=0.25, maxval=2.0)
    flip = jax.random.uniform(ks[3], (n,)) < 0.5
    place_x = u(ks[4])
    place_y = u(ks[5])
    hsv_r = (
        jax.random.uniform(ks[6], (n, 3), minval=-1.0, maxval=1.0)
        * jnp.asarray([hue, sat, val])
        + 1.0
    )
    return ar_a, ar_b, scale, flip, place_x, place_y, hsv_r


def _axis_coords(out_size: int, n_new: jax.Array, offset: jax.Array,
                 src_lo: jax.Array, src_extent: jax.Array, flip: jax.Array | None):
    """Source coordinates for one output axis of the paste-resample.

    Output pixel p maps into the pasted rectangle [offset, offset+n_new);
    inside it, the source coordinate spans [src_lo, src_lo+src_extent) with
    PIL box-resize convention (src = (p+0.5)/n_new * extent - 0.5 + lo).
    Returns (coords (N, out_size), valid (N, out_size)).
    """
    p = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # (1, S)
    rel = p - offset[:, None]  # position inside the pasted rect
    valid = (rel >= 0) & (rel < n_new[:, None])
    t = (rel + 0.5) / jnp.maximum(n_new[:, None], 1.0)  # (0,1) inside rect
    if flip is not None:
        t = jnp.where(flip[:, None], 1.0 - t, t)
    coords = t * src_extent[:, None] - 0.5 + src_lo[:, None]
    return coords, valid


def _weight_matrix(coords: jax.Array, in_size: int, mode: str) -> jax.Array:
    """(N, out, in) per-sample 1-D interpolation matrix.

    Per-sample resampling as a batched MATMUL instead of a gather: a general
    gather with (N, 512, 512, 3) index arrays costs ~485 ms on v5e (random
    HBM access), while building the tent/one-hot weight matrix on the VPU and
    contracting it on the MXU costs ~1 ms for the same shapes.
    """
    i = jnp.arange(in_size, dtype=jnp.float32)
    c = jnp.clip(coords, 0.0, in_size - 1)[..., None]  # (N, out, 1)
    if mode == "bilinear":
        return jnp.clip(1.0 - jnp.abs(c - i), 0.0, 1.0)
    # nearest, PIL convention: floor(c + 0.5)
    idx = jnp.clip(jnp.floor(c + 0.5), 0, in_size - 1)
    return (i == idx).astype(jnp.float32)


def _resample_h(x: jax.Array, coords: jax.Array, mode: str) -> jax.Array:
    """Resample NHWC along H with per-sample (N, out_h) coords."""
    w = _weight_matrix(coords, x.shape[1], mode)
    return jnp.einsum("noi,niwc->nowc", w, x, precision=jax.lax.Precision.HIGHEST)


def _resample_w(x: jax.Array, coords: jax.Array, mode: str) -> jax.Array:
    """Resample NHWC along W with per-sample (N, out_w) coords."""
    w = _weight_matrix(coords, x.shape[2], mode)
    return jnp.einsum("noi,nhic->nhoc", w, x, precision=jax.lax.Precision.HIGHEST)


def rgb_to_hsv_cv(rgb: jax.Array):
    """cv2-convention HSV from float RGB in [0,1]: H in [0,180), S/V in [0,255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc, 0.0)
    h = jnp.where(maxc == g, 2.0 + rc - bc, h)
    h = jnp.where(maxc == b, 4.0 + gc - rc, h)
    h = jnp.where(delta > 0, h, 0.0)
    h = (h * 60.0) % 360.0
    return h / 2.0, s * 255.0, maxc * 255.0


def hsv_to_rgb_cv(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    """cv2-convention HSV -> float RGB in [0,1]."""
    hdeg = h * 2.0
    sf = s / 255.0
    vf = v / 255.0
    c = vf * sf
    hp = hdeg / 60.0
    x = c * (1 - jnp.abs(hp % 2 - 1))
    z = jnp.zeros_like(c)
    idx = jnp.clip(hp.astype(jnp.int32), 0, 5)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    m = vf - c
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_jitter_device(img01: jax.Array, gains: jax.Array) -> jax.Array:
    """HSV channel-gain jitter on float RGB [0,1]; gains (N,3) like the cv2 LUTs
    ((x*r_h) % 180, clip(x*r_s), clip(x*r_v) — hf_dataloader.py:164-178)."""
    h, s, v = rgb_to_hsv_cv(img01)
    g = gains[:, None, None, :]
    h = (h * g[..., 0]) % 180.0
    s = jnp.clip(s * g[..., 1], 0.0, 255.0)
    v = jnp.clip(v * g[..., 2], 0.0, 255.0)
    return hsv_to_rgb_cv(h, s, v)


@partial(
    jax.jit,
    static_argnames=("out_hw", "jitter", "hue", "sat", "val", "binary", "num_classes"),
)
def augment_batch(
    canvas_img: jax.Array,  # (N, C, C, 3) uint8, letterboxed, gray fill
    canvas_mask: jax.Array,  # (N, C, C) uint8/int32
    valid_wh: jax.Array,  # (N, 2) float32: letterboxed content (nw, nh)
    key: jax.Array,
    out_hw: tuple[int, int] = (512, 512),
    jitter: float = 0.3,
    hue: float = 0.1,
    sat: float = 0.7,
    val: float = 0.3,
    binary: bool = True,
    num_classes: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Random-augment a cached canvas batch on device.

    Returns (images (N,H,W,3) float32 in [0,1], masks (N,H,W) int32).
    """
    n, ch, cw = canvas_img.shape[0], canvas_img.shape[1], canvas_img.shape[2]
    h_out, w_out = out_hw
    ar_a, ar_b, scale, flip, px, py, hsv_r = _sample_params(
        key, n, jitter, hue, sat, val
    )

    nw, nh = valid_wh[:, 0], valid_wh[:, 1]
    # new aspect ratio and pasted-rectangle size (hf_dataloader.py:135-143),
    # floor()ed like the reference's int() casts
    new_ar = (nw / nh) * ar_a / ar_b
    nh_new = jnp.where(new_ar < 1, jnp.floor(scale * h_out), 0.0)
    nw_new = jnp.where(new_ar < 1, jnp.floor(nh_new * new_ar), 0.0)
    nw_new = jnp.where(new_ar < 1, nw_new, jnp.floor(scale * w_out))
    nh_new = jnp.where(new_ar < 1, nh_new, jnp.floor(nw_new / new_ar))
    nw_new = jnp.maximum(nw_new, 1.0)
    nh_new = jnp.maximum(nh_new, 1.0)

    # random placement: dx ~ U(0, w-nw_new) — can be negative when the
    # pasted rect is larger than the canvas, exactly like the reference
    dx = jnp.floor(px * (w_out - nw_new))
    dy = jnp.floor(py * (h_out - nh_new))

    # source content rectangle inside the cached canvas (centered letterbox)
    src_x0 = (cw - nw) / 2.0
    src_y0 = (ch - nh) / 2.0

    xc, xv = _axis_coords(w_out, nw_new, dx, src_x0, nw, flip)
    yc, yv = _axis_coords(h_out, nh_new, dy, src_y0, nh, None)

    img = canvas_img.astype(jnp.float32) / 255.0
    img = _resample_h(img, yc, "bilinear")
    img = _resample_w(img, xc, "bilinear")
    inside = (yv[:, :, None] & xv[:, None, :])[..., None]
    img = jnp.where(inside, img, 128.0 / 255.0)

    mask = canvas_mask.astype(jnp.float32)[..., None]
    mask = _resample_h(mask, yc, "nearest")
    mask = _resample_w(mask, xc, "nearest")
    mask = jnp.where(inside, mask, 0.0)[..., 0]
    mask = jnp.round(mask).astype(jnp.int32)

    img = hsv_jitter_device(img, hsv_r)
    if binary:
        mask = (mask > 0).astype(jnp.int32)
    elif num_classes is not None:
        # labels >= num_classes become the ignore class (hf_dataloader.py:87)
        mask = jnp.where(mask >= num_classes, num_classes, mask)
    return img, mask


@partial(jax.jit, static_argnames=("binary", "num_classes"))
def preprocess_eval_batch(
    canvas_img: jax.Array,
    canvas_mask: jax.Array,
    binary: bool = True,
    num_classes: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Eval path: the cached canvas IS the letterboxed input; just normalize."""
    img = canvas_img.astype(jnp.float32) / 255.0
    mask = canvas_mask.astype(jnp.int32)
    if binary:
        mask = (mask > 0).astype(jnp.int32)
    elif num_classes is not None:
        mask = jnp.where(mask >= num_classes, num_classes, mask)
    return img, mask
