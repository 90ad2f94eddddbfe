"""Device-resident dataset + scan-based epoch execution.

The embroidery datasets are tiny (<= 584 train images, SURVEY.md §6 — about
460 MB as uint8 at 512x512), while the host link can be slow (this machine
tunnels to the TPU at ~10 MB/s and ~30 ms RTT). Shipping every batch from
host costs ~750 ms/step against an ~80 ms train step. So the TPU-native
input design is:

  1. upload the letterboxed uint8 canvases to HBM ONCE (ResidentData),
  2. each epoch, ship only the shuffled index matrix + RNG seed (a few KB),
  3. run a chunk of train steps inside one jitted ``lax.scan`` — on-device
     batch gather -> on-device augmentation (ops/device_augment.py) ->
     train step — so each dispatch covers ``chunk`` steps and pays one RTT.

Eval runs the same way (gather -> normalize -> eval step) with metric
counts accumulated on device and fetched once per chunk.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops import device_augment


@dataclass
class ResidentData:
    """Whole-split canvases living in device memory (replicated)."""

    images_u8: jax.Array  # (N, H, W, 3) uint8
    masks_u8: jax.Array  # (N, H, W) uint8
    valid_wh: jax.Array  # (N, 2) float32
    cls_labels: jax.Array | None  # (N,) int32
    n: int


def upload(cache, mesh=None) -> ResidentData:
    """device_put the CanvasCache, replicated over the mesh."""
    if mesh is not None:
        from unet_embroidery_seg_tpu.parallel import replicate

        put = lambda x: jax.device_put(x, replicate(mesh))  # noqa: E731
    else:
        put = jax.device_put
    return ResidentData(
        images_u8=put(cache.images),
        masks_u8=put(cache.masks),
        valid_wh=put(cache.valid_wh),
        cls_labels=put(cache.cls_labels) if cache.cls_labels is not None else None,
        n=len(cache),
    )


def epoch_index_plan(
    n: int, batch_size: int, epoch: int, shuffle: bool, seed: int,
    max_batches: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side plan: (steps, B) int32 indices + (steps, B) f32 sample mask.

    Mirrors DataLoader semantics: shuffle by (seed, epoch), final partial
    batch padded by repeating, padding masked out.
    """
    order = np.arange(n)
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    idx_rows, mask_rows = [], []
    for start in range(0, n, batch_size):
        idxs = order[start : start + batch_size]
        n_valid = len(idxs)
        if n_valid < batch_size:
            reps = -(-batch_size // n_valid)
            idxs = np.tile(idxs, reps)[:batch_size]
        idx_rows.append(idxs)
        mask_rows.append((np.arange(batch_size) < n_valid).astype(np.float32))
        if max_batches and len(idx_rows) >= max_batches:
            break
    return np.stack(idx_rows).astype(np.int32), np.stack(mask_rows)


def _gather_batch(data: ResidentData, idxs: jax.Array):
    imgs = jnp.take(data.images_u8, idxs, axis=0)
    masks = jnp.take(data.masks_u8, idxs, axis=0)
    wh = jnp.take(data.valid_wh, idxs, axis=0)
    cls = (
        jnp.take(data.cls_labels, idxs, axis=0)
        if data.cls_labels is not None
        else None
    )
    return imgs, masks, wh, cls


def make_train_chunk_fn(
    train_step: Callable,
    input_shape: tuple[int, int],
    binary: bool,
    num_classes: int,
    multitask: bool = False,
    augment: bool = True,
) -> Callable:
    """Build chunk_fn(state, data, idx (K,B), mask (K,B), steps (K,), key).

    Returns (new_state, per-step losses) — for multitask, losses is a tuple
    ((K,) total, (K,) seg, (K,) cls, (K,) n_correct).
    """

    # Unwrap the jitted step: a donate_argnums jit nested inside lax.scan
    # compiles pathologically (hangs); scan wants the plain traceable fn.
    step_fn = getattr(train_step, "__wrapped__", train_step)

    @partial(jax.jit, donate_argnums=0, static_argnums=1)
    def chunk_fn(state, data_static, images_u8, masks_u8, valid_wh, cls_labels,
                 idx, mask, steps, key):
        data = ResidentData(images_u8, masks_u8, valid_wh, cls_labels, 0)

        def body(state, inp):
            idxs, sm, step_id = inp
            imgs, masks, wh, cls = _gather_batch(data, idxs)
            k = jax.random.fold_in(key, step_id)
            if augment:
                images, pngs = device_augment.augment_batch(
                    imgs, masks, wh, k,
                    out_hw=input_shape, binary=binary,
                    num_classes=None if binary else num_classes,
                )
            else:
                images, pngs = device_augment.preprocess_eval_batch(
                    imgs, masks, binary=binary,
                    num_classes=None if binary else num_classes,
                )
            if multitask:
                state, losses, correct = step_fn(state, images, pngs, cls, sm, k)
                return state, (*losses, correct.astype(jnp.float32))
            state, loss = step_fn(state, images, pngs, sm, k)
            return state, loss

        return jax.lax.scan(body, state, (idx, mask, steps))

    def call(state, data: ResidentData, idx, mask, steps, key):
        return chunk_fn(
            state, None, data.images_u8, data.masks_u8, data.valid_wh,
            data.cls_labels, idx, mask, steps, key,
        )

    return call


def make_eval_chunk_fn(
    eval_step: Callable,
    input_shape: tuple[int, int],
    binary: bool,
    num_classes: int,
    multitask: bool = False,
) -> Callable:
    """chunk_fn(state, data, idx, mask) -> per-step (loss, metrics) stacks."""

    eval_fn = getattr(eval_step, "__wrapped__", eval_step)

    @jax.jit
    def chunk_fn(state, images_u8, masks_u8, valid_wh, cls_labels, idx, mask):
        data = ResidentData(images_u8, masks_u8, valid_wh, cls_labels, 0)

        def body(_, inp):
            idxs, sm = inp
            imgs, masks, wh, cls = _gather_batch(data, idxs)
            images, pngs = device_augment.preprocess_eval_batch(
                imgs, masks, binary=binary,
                num_classes=None if binary else num_classes,
            )
            if multitask:
                out = eval_fn(state, images, pngs, cls, sm)
            else:
                out = eval_fn(state, images, pngs, sm)
            return None, out

        _, outs = jax.lax.scan(body, None, (idx, mask))
        return outs

    def call(state, data: ResidentData, idx, mask):
        return chunk_fn(
            state, data.images_u8, data.masks_u8, data.valid_wh,
            data.cls_labels, idx, mask,
        )

    return call
