"""Export SyntheticSource to an HF parquet tree both frameworks can read.

Produces ``{out}/{config}/{split}/data.parquet`` — the merged_dataset_v2
layout the reference loads via ``datasets.load_dataset(f"{dir}/{config}",
split=...)`` (/root/reference/utils/hf_dataloader.py:58-61) and this
framework loads via data/sources.py:HFParquetSource. Used by the accuracy
parity study (PARITY.md): the torch reference and the TPU framework train on
byte-identical data.

Usage:
    python scripts/export_parity_dataset.py --out /tmp/parity_ds \
        [--config no-ai] [--train 64 --val 16 --test 16] [--seed 0]
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def export(args) -> None:
    from datasets import Dataset

    from unet_embroidery_seg_tpu.data.sources import SyntheticSource

    sizes = {"train": args.train, "validation": args.val, "test": args.test}
    for split, n in sizes.items():
        source = SyntheticSource(split=split, length=n, seed=args.seed,
                                 mask_classes=args.mask_classes,
                                 n_blobs_range=tuple(args.blobs),
                                 label_mode=args.label_mode)
        data = {"image": [], "mask": [], "label": [], "filename": []}
        for i in range(len(source)):
            s = source[i]
            # Embed bytes (not paths) so the parquet is self-contained.
            img_buf, mask_buf = io.BytesIO(), io.BytesIO()
            s["image"].save(img_buf, format="PNG")
            s["mask"].save(mask_buf, format="PNG")
            data["image"].append({"bytes": img_buf.getvalue(), "path": None})
            data["mask"].append({"bytes": mask_buf.getvalue(), "path": None})
            data["label"].append(s["label"])
            data["filename"].append(s["filename"])
        from datasets import Features, Image as HFImage, Value

        features = Features(
            {
                "image": HFImage(),
                "mask": HFImage(),
                "label": Value("string"),
                "filename": Value("string"),
            }
        )
        ds = Dataset.from_dict(data, features=features)
        split_dir = os.path.join(args.out, args.config, split)
        os.makedirs(split_dir, exist_ok=True)
        ds.to_parquet(os.path.join(split_dir, "data.parquet"))
        print(f"{args.config}/{split}: {len(ds)} samples")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/parity_ds")
    p.add_argument("--config", default="no-ai")
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--val", type=int, default=16)
    p.add_argument("--test", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mask-classes", type=int, default=1,
                   help=">1: multiclass masks (blob pixels get class ids "
                        "1..K) for the multiclass parity study")
    p.add_argument("--blobs", type=int, nargs=2, default=[1, 5],
                   metavar=("LO", "HI"),
                   help="blob-count range (rng.integers semantics: HI "
                        "exclusive); raise for a higher foreground "
                        "fraction (the scaled multitask regime)")
    p.add_argument("--label-mode", choices=["random", "visual"],
                   default="random",
                   help="'visual': class derives from image content "
                        "(dominant mean blob color channel) so the "
                        "multitask cls head has learnable signal")
    return p.parse_args(argv)


if __name__ == "__main__":
    export(parse_args())
