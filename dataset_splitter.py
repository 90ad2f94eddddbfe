"""Split a VOC-style dataset into train/val/test id lists.

Parity target: /root/reference/dataset_splitter.py (70/20/10 shuffled split
of SegmentationClass/*.png into ImageSets/Segmentation/{train,val,test}.txt).
This version takes CLI args instead of hardcoded paths and a --seed for a
reproducible shuffle.
"""

from __future__ import annotations

import argparse
import glob
import os
import random


def split_dataset(
    voc_root: str,
    train_ratio: float = 0.7,
    val_ratio: float = 0.2,
    seed: int | None = None,
) -> dict[str, list[str]]:
    mask_dir = os.path.join(voc_root, "SegmentationClass")
    image_sets_dir = os.path.join(voc_root, "ImageSets", "Segmentation")
    os.makedirs(image_sets_dir, exist_ok=True)

    mask_files = sorted(glob.glob(os.path.join(mask_dir, "*.png")))
    rng = random.Random(seed)
    rng.shuffle(mask_files)

    n_train = int(len(mask_files) * train_ratio)
    n_val = int(len(mask_files) * val_ratio)
    splits = {
        "train": mask_files[:n_train],
        "val": mask_files[n_train : n_train + n_val],
        "test": mask_files[n_train + n_val :],
    }

    out = {}
    for split, files in splits.items():
        ids = [os.path.splitext(os.path.basename(f))[0] for f in files]
        with open(os.path.join(image_sets_dir, f"{split}.txt"), "w", encoding="utf-8") as f:
            f.write("".join(i + "\n" for i in ids))
        out[split] = ids
    print(
        f"[OK] wrote train.txt ({len(out['train'])}), val.txt ({len(out['val'])}), "
        f"test.txt ({len(out['test'])}) under {image_sets_dir}"
    )
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="VOC train/val/test splitter")
    p.add_argument("--voc-root", default="VOCdevkit/VOC2012")
    p.add_argument("--train-ratio", default=0.7, type=float)
    p.add_argument("--val-ratio", default=0.2, type=float)
    p.add_argument("--seed", default=None, type=int)
    return p.parse_args(argv)


if __name__ == "__main__":
    a = parse_args()
    split_dataset(a.voc_root, a.train_ratio, a.val_ratio, a.seed)
