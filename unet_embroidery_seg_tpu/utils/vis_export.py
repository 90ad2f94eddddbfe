"""Qualitative 2x2 visualization grids (parity: /root/reference/utils/vis_export.py).

Per sample: original / red GT / green prediction / 0.5-alpha overlay, with
fixed-seed index sampling written to ``indices.json`` so different runs can
be compared side-by-side.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import numpy as np
from PIL import Image

import jax.numpy as jnp

from unet_embroidery_seg_tpu.data.augment import letterbox


def _mask_to_rgb(mask01: np.ndarray, fg_color=(255, 0, 0)) -> np.ndarray:
    mask01 = (mask01 > 0).astype(np.uint8)
    h, w = mask01.shape
    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[mask01 == 1] = np.array(fg_color, dtype=np.uint8)
    return out


def _make_grid(img_rgb, gt01, pred01, alpha: float = 0.5) -> Image.Image:
    img = img_rgb.astype(np.uint8)
    gt_rgb = _mask_to_rgb(gt01, fg_color=(255, 0, 0))
    pred_rgb = _mask_to_rgb(pred01, fg_color=(0, 255, 0))
    overlay = (
        (img.astype(np.float32) * (1 - alpha) + pred_rgb.astype(np.float32) * alpha)
        .clip(0, 255)
        .astype(np.uint8)
    )
    h, w = img.shape[:2]
    canvas = Image.new("RGB", (w * 2, h * 2))
    canvas.paste(Image.fromarray(img), (0, 0))
    canvas.paste(Image.fromarray(gt_rgb), (w, 0))
    canvas.paste(Image.fromarray(pred_rgb), (0, h))
    canvas.paste(Image.fromarray(overlay), (w, h))
    return canvas


def export_binary_visuals(
    predict_fn,
    variables: dict,
    source,
    out_dir: str,
    input_shape: tuple[int, int],
    num_samples: int = 8,
    seed: int = 0,
    multitask: bool = False,
) -> None:
    """Export 2x2 grids for ``num_samples`` fixed-seed test samples.

    ``predict_fn(variables, images)`` is a jitted forward (engine.steps.
    make_predict_fn); ``source`` yields raw dicts with PIL image/mask.
    """
    out_path = Path(out_dir)
    out_path.mkdir(parents=True, exist_ok=True)

    length = len(source)
    num_samples = min(num_samples, length)
    rng = random.Random(seed)
    indices = rng.sample(range(length), k=num_samples) if num_samples > 0 else []

    with (out_path / "indices.json").open("w", encoding="utf-8") as f:
        json.dump(indices, f, ensure_ascii=False, indent=2)

    for idx in indices:
        sample = source[idx]
        img_pil, mask_pil = letterbox(sample["image"], sample["mask"], input_shape)
        img_np = np.array(img_pil, dtype=np.uint8)
        gt = (np.array(mask_pil) > 0).astype(np.uint8)

        img_in = jnp.asarray(img_np, jnp.float32)[None] / 255.0
        logits = predict_fn(variables, img_in)
        if multitask:
            seg_logits, _ = logits
            pred = np.asarray(seg_logits[0, ..., 0] > 0).astype(np.uint8)
        else:
            pred = np.asarray(jnp.argmax(logits[0], axis=-1)).astype(np.uint8)

        grid = _make_grid(img_np, gt, pred, alpha=0.5)
        filename = sample.get("filename") or f"sample_{idx}"
        save_name = f"{idx:04d}_{Path(filename).stem}_grid.png"
        grid.save(out_path / save_name)
