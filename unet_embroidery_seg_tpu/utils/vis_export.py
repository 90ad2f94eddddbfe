"""Qualitative 2x2 prediction grids for a fixed-seed sample of the test set.

Artifact contract (reference workflow parity): ``vis/indices.json`` listing
the sampled indices plus one ``NNNN_<stem>_grid.png`` per sample laid out as

    [ original image | ground truth in red  ]
    [ prediction in green | 0.5-alpha overlay ]

Panels are assembled as one numpy block matrix; predictions come from the
jitted forward (engine.steps.make_predict_fn) on the letterboxed input.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import numpy as np
from PIL import Image

import jax.numpy as jnp

from unet_embroidery_seg_tpu.data.augment import letterbox


def _tint(binary: np.ndarray, channel: int) -> np.ndarray:
    """{0,1} mask -> RGB with the foreground painted on one channel."""
    rgb = np.zeros(binary.shape + (3,), np.uint8)
    rgb[..., channel] = np.where(binary > 0, 255, 0).astype(np.uint8)
    return rgb


def render_grid(image_u8: np.ndarray, gt01: np.ndarray, pred01: np.ndarray,
                alpha: float = 0.5) -> np.ndarray:
    """Assemble the 2x2 panel as one uint8 array."""
    gt_panel = _tint(gt01, channel=0)  # red
    pred_panel = _tint(pred01, channel=1)  # green
    blend = np.clip(
        image_u8 * (1.0 - alpha) + pred_panel * alpha, 0, 255
    ).astype(np.uint8)
    top = np.concatenate([image_u8, gt_panel], axis=1)
    bottom = np.concatenate([pred_panel, blend], axis=1)
    return np.concatenate([top, bottom], axis=0)


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
    """Write grids for up to ``num_samples`` deterministically-chosen samples."""
    folder = Path(out_dir)
    folder.mkdir(parents=True, exist_ok=True)

    k = min(num_samples, len(source))
    chosen = random.Random(seed).sample(range(len(source)), k=k) if k else []
    (folder / "indices.json").write_text(
        json.dumps(chosen, ensure_ascii=False, indent=2), encoding="utf-8"
    )

    for idx in chosen:
        record = source[idx]
        img_pil, mask_pil = letterbox(record["image"], record["mask"], input_shape)
        image_u8 = np.asarray(img_pil, np.uint8)
        gt01 = (np.asarray(mask_pil) > 0).astype(np.uint8)

        batch = jnp.asarray(image_u8, jnp.float32)[None] / 255.0
        out = predict_fn(variables, batch)
        if multitask:
            pred01 = np.asarray(out[0][0, ..., 0] > 0, np.uint8)
        else:
            pred01 = np.asarray(jnp.argmax(out[0], axis=-1), np.uint8)

        stem = Path(str(record.get("filename") or f"sample_{idx}")).stem
        Image.fromarray(render_grid(image_u8, gt01, pred01)).save(
            folder / f"{idx:04d}_{stem}_grid.png"
        )
