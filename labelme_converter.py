"""Convert labelme JSON annotations to VOC palettized PNG masks + splits.

Parity target: /root/reference/labelme_converter.py — reads
``{voc_root}/JPEGImages/*.json`` (labelme format), rasterizes the labeled
shapes into a palettized label PNG under ``{voc_root}/SegmentationClass/``,
and writes 70/20/10 train/val/test id lists.

Unlike the reference, this needs no ``labelme`` package: shapes are
rasterized directly with PIL (polygon / rectangle / circle / linestrip),
which covers the shape types labelme emits for segmentation datasets.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random

import numpy as np
from PIL import Image, ImageDraw

from dataset_splitter import split_dataset


def get_voc_palette(num_cls: int = 256) -> list[int]:
    """Standard VOC color palette (bit-interleave of the class index)."""
    palette = [0] * (num_cls * 3)
    for j in range(num_cls):
        lab = j
        for i in range(8):
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            lab >>= 3
    return palette


def shapes_to_label(
    img_shape: tuple[int, int],
    shapes: list[dict],
    label_name_to_value: dict[str, int],
) -> np.ndarray:
    """Rasterize labelme shapes into an int label image (PIL-native)."""
    h, w = img_shape[:2]
    canvas = Image.new("I", (w, h), 0)
    draw = ImageDraw.Draw(canvas)
    for shape in shapes:
        value = label_name_to_value.get(shape.get("label", ""), 0)
        pts = [(float(x), float(y)) for x, y in shape.get("points", [])]
        stype = shape.get("shape_type", "polygon")
        if stype == "rectangle" and len(pts) == 2:
            draw.rectangle([pts[0], pts[1]], fill=value)
        elif stype == "circle" and len(pts) == 2:
            (cx, cy), (px, py) = pts
            r = ((cx - px) ** 2 + (cy - py) ** 2) ** 0.5
            draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=value)
        elif stype in ("polygon", "linestrip") and len(pts) >= 3:
            draw.polygon(pts, fill=value)
        elif len(pts) >= 3:  # unknown shape type with enough points
            draw.polygon(pts, fill=value)
    return np.asarray(canvas, dtype=np.int32)


def image_size_from_json(data: dict, json_dir: str) -> tuple[int, int]:
    """(h, w) from the labelme record, preferring explicit fields."""
    if "imageHeight" in data and "imageWidth" in data:
        return int(data["imageHeight"]), int(data["imageWidth"])
    image_path = os.path.join(json_dir, data["imagePath"])
    with Image.open(image_path) as im:
        return im.height, im.width


def convert(voc_root: str, label_names: list[str], seed: int | None = None) -> int:
    json_dir = os.path.join(voc_root, "JPEGImages")
    output_dir = os.path.join(voc_root, "SegmentationClass")
    os.makedirs(output_dir, exist_ok=True)

    label_name_to_value = {name: idx for idx, name in enumerate(label_names)}
    palette = get_voc_palette(256)
    json_files = sorted(glob.glob(os.path.join(json_dir, "*.json")))

    n_ok = 0
    for json_file in json_files:
        try:
            with open(json_file, "r", encoding="utf-8") as f:
                data = json.load(f)
            hw = image_size_from_json(data, json_dir)
            label_img = shapes_to_label(hw, data.get("shapes", []), label_name_to_value)
            label_pil = Image.fromarray(label_img.astype(np.uint8), mode="P")
            label_pil.putpalette(palette)
            base = os.path.splitext(os.path.basename(json_file))[0]
            out_path = os.path.join(output_dir, f"{base}.png")
            label_pil.save(out_path)
            print(f"[OK] {json_file} -> {out_path}")
            n_ok += 1
        except Exception as e:  # keep converting the rest, like the reference
            print(f"[ERR] {json_file}: {e}")

    # Split over the produced masks (the reference splits over the json list;
    # identical ids since every converted json yields one mask).
    split_dataset(voc_root, seed=seed)
    return n_ok


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="labelme JSON -> VOC mask converter")
    p.add_argument("--voc-root", default="VOCdevkit/VOC2012")
    p.add_argument(
        "--labels",
        default="_background_,chicken,cat,dog",
        help="Comma-separated label names; index in this list = pixel value",
    )
    p.add_argument("--seed", default=None, type=int)
    return p.parse_args(argv)


if __name__ == "__main__":
    a = parse_args()
    convert(a.voc_root, [s for s in a.labels.split(",") if s], a.seed)
