"""Decoded-image RAM cache + batched loader for the on-device augment path.

Decodes and letterboxes every sample ONCE (the expensive PIL work), keeping
uint8 canvases in host RAM; per-epoch batches are then cheap array slices
shipped to the device, where ops/device_augment.py applies the random
augmentation. The embroidery datasets are small (<= 584 train images,
SURVEY.md §6), so a 512x512 uint8 cache is ~460 MB — well within host RAM.

This replaces the reference's per-item DataLoader-worker decode+augment
(hf_dataloader.py:67-180) for training throughput; the host-side path
(data/dataset.py) remains the semantics reference and the fallback.
"""

from __future__ import annotations

import numpy as np

from unet_embroidery_seg_tpu.data.augment import letterbox
from unet_embroidery_seg_tpu.data.sources import class_index_from_label


class CanvasCache:
    """uint8 letterboxed canvases for a whole split, built once."""

    def __init__(
        self,
        source,
        input_shape: tuple[int, int],
        return_cls_label: bool = False,
        verbose: bool = True,
    ):
        n = len(source)
        h, w = input_shape
        self.images = np.zeros((n, h, w, 3), np.uint8)
        self.masks = np.zeros((n, h, w), np.uint8)
        self.valid_wh = np.zeros((n, 2), np.float32)
        self.cls_labels = np.zeros((n,), np.int32) if return_cls_label else None
        for i in range(n):
            sample = source[i]
            img, msk = sample["image"], sample["mask"]
            iw, ih = img.size
            scale = min(w / iw, h / ih)
            nw, nh = int(iw * scale), int(ih * scale)
            canvas_img, canvas_mask = letterbox(img, msk, input_shape)
            self.images[i] = np.asarray(canvas_img, np.uint8)
            self.masks[i] = np.asarray(canvas_mask, np.uint8)
            self.valid_wh[i] = (nw, nh)
            if self.cls_labels is not None:
                self.cls_labels[i] = class_index_from_label(
                    str(sample.get("label", "unknown"))
                )
        if verbose:
            mb = (self.images.nbytes + self.masks.nbytes) / 2**20
            print(f"[cache] {n} samples letterboxed to {h}x{w} ({mb:.0f} MB host RAM)")

    def __len__(self) -> int:
        return len(self.images)

    def batches(self, batch_size: int, epoch: int, shuffle: bool, seed: int,
                pad_final: bool = True):
        """Yield (img_u8, mask_u8, valid_wh, cls, n_valid) numpy batch views."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(order)
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            n_valid = len(idxs)
            if pad_final and n_valid < batch_size:
                reps = -(-batch_size // n_valid)
                idxs = np.tile(idxs, reps)[:batch_size]
            cls = self.cls_labels[idxs] if self.cls_labels is not None else None
            yield (
                self.images[idxs],
                self.masks[idxs],
                self.valid_wh[idxs],
                cls,
                n_valid,
            )
