"""Convert VOC-style datasets to HF parquet configs and (optionally) upload.

Parity target: /root/reference/convert_and_upload.py — builds the
``merged_dataset_v2`` multi-config parquet layout:

    {output}/merged_dataset_v2/{full,no-ai,sam3}/{train,validation,test}/data.parquet

with image/mask (HF Image), label (filename prefix), filename, subset
columns, plus a dataset README whose stats table is computed from the actual
split sizes (the reference hardcodes them). Upload to the HF hub is a
separate opt-in step (``--upload``) gated on HF_TOKEN.

The sam3 config intersects the no-ai split lists with the SAM3 mask set:
masks come from the sam3 tree, images from the no-ai tree
(reference convert_sam3_to_hf, convert_and_upload.py:138-180).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path


def get_label_from_filename(filename: str) -> str:
    """Leading non-digit characters of the stem (reference :36-44)."""
    name = Path(filename).stem
    label = ""
    for char in name:
        if char.isdigit():
            break
        label += char
    return label if label else "unknown"


def load_split_ids(split_file: Path) -> list[str]:
    with open(split_file, "r", encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def _find_with_ext(directory: Path, stem: str) -> Path | None:
    for ext in (".png", ".jpg", ".jpeg"):
        p = directory / f"{stem}{ext}"
        if p.exists():
            return p
    return None


def create_dataset_split(split_ids, jpeg_dir: Path, mask_dir: Path, subset_name: str):
    from datasets import Dataset
    from datasets import Image as HFImage

    data = {"image": [], "mask": [], "label": [], "filename": [], "subset": []}
    for image_id in split_ids:
        img = _find_with_ext(jpeg_dir, image_id)
        mask = _find_with_ext(mask_dir, image_id)
        if img is None or mask is None:
            continue  # skip missing pairs silently, like the reference
        # Embed the encoded bytes (a bare path would serialize as a relative
        # path reference and break when the parquet moves machines).
        data["image"].append({"bytes": img.read_bytes(), "path": img.name})
        data["mask"].append({"bytes": mask.read_bytes(), "path": mask.name})
        data["label"].append(get_label_from_filename(image_id))
        data["filename"].append(image_id)
        data["subset"].append(subset_name)
    ds = Dataset.from_dict(data)
    ds = ds.cast_column("image", HFImage())
    ds = ds.cast_column("mask", HFImage())
    return ds


SPLIT_FILES = {"train": "train.txt", "validation": "val.txt", "test": "test.txt"}


def convert_voc(voc_root: Path, subset_name: str) -> dict:
    """VOC tree -> {split: Dataset}."""
    jpeg_dir = voc_root / "JPEGImages"
    mask_dir = voc_root / "SegmentationClass"
    split_dir = voc_root / "ImageSets" / "Segmentation"
    out = {}
    for split, fname in SPLIT_FILES.items():
        split_file = split_dir / fname
        if split_file.exists():
            ids = load_split_ids(split_file)
            out[split] = create_dataset_split(ids, jpeg_dir, mask_dir, subset_name)
            print(f"    {subset_name}/{split}: {len(out[split])} samples")
    return out


def convert_sam3(sam3_root: Path, no_ai_root: Path, subset_name: str) -> dict:
    """sam3 config: no-ai splits ∩ available SAM3 masks; images from no-ai."""
    sam3_mask_dir = sam3_root / "JPEGImages"
    jpeg_dir = no_ai_root / "JPEGImages"
    split_dir = no_ai_root / "ImageSets" / "Segmentation"
    sam3_ids = {p.stem for p in sam3_mask_dir.glob("*.png")}
    print(f"  found {len(sam3_ids)} SAM3 masks")
    out = {}
    for split, fname in SPLIT_FILES.items():
        split_file = split_dir / fname
        if split_file.exists():
            ids = load_split_ids(split_file)
            kept = [i for i in ids if i in sam3_ids]
            out[split] = create_dataset_split(kept, jpeg_dir, sam3_mask_dir, subset_name)
            print(
                f"    {subset_name}/{split}: {len(out[split])} samples "
                f"(skipped {len(ids) - len(kept)} without SAM3 masks)"
            )
    return out


def _write_config(ds_dict: dict, config_dir: Path) -> dict[str, int]:
    config_dir.mkdir(parents=True, exist_ok=True)
    sizes = {}
    for split, ds in ds_dict.items():
        if len(ds) == 0:
            print(f"    [WARN] {config_dir.name}/{split} is empty; skipping parquet")
            sizes[split] = 0
            continue
        split_dir = config_dir / split
        split_dir.mkdir(exist_ok=True)
        ds.to_parquet(str(split_dir / "data.parquet"))
        sizes[split] = len(ds)
    return sizes


def _readme(stats: dict[str, dict[str, int]], repo_id: str) -> str:
    rows = []
    for cfg, s in stats.items():
        tr, va, te = s.get("train", 0), s.get("validation", 0), s.get("test", 0)
        rows.append(f"| {cfg} | {tr} | {va} | {te} | {tr + va + te} |")
    table = "\n".join(rows)
    return f"""---
tags:
- image-segmentation
- computer-vision
- embroidery
- unet
- semantic-segmentation
---

# 刺绣图像分割数据集

用于 U-Net 语义分割的刺绣图像数据集。

## 使用方法

```python
from datasets import load_dataset

ds = load_dataset("{repo_id}", data_dir="full")
ds = load_dataset("{repo_id}", data_dir="no-ai")
ds = load_dataset("{repo_id}", data_dir="sam3")
```

## 数据集统计

| Config | Train | Val | Test | Total |
|--------|-------|-----|------|-------|
{table}

## 子集说明

- **full**: 完整数据集，包含所有图片
- **no-ai**: 去除 AI 生成的图片，只保留真实刺绣图案
- **sam3**: 使用 SAM3 模型重新标注的 mask，基于 no-ai 的子集
"""


def create_merged_dataset(args) -> Path:
    merged_dir = Path(args.output_dir) / "merged_dataset_v2"
    if merged_dir.exists():
        shutil.rmtree(merged_dir)
    merged_dir.mkdir(parents=True, exist_ok=True)

    stats: dict[str, dict[str, int]] = {}
    print("\n1. converting full ...")
    stats["full"] = _write_config(
        convert_voc(Path(args.voc_original), "full"), merged_dir / "full"
    )
    print("\n2. converting no-ai ...")
    stats["no-ai"] = _write_config(
        convert_voc(Path(args.voc_no_ai), "no-ai"), merged_dir / "no-ai"
    )
    print("\n3. converting sam3 ...")
    stats["sam3"] = _write_config(
        convert_sam3(Path(args.voc_sam3), Path(args.voc_no_ai), "sam3"),
        merged_dir / "sam3",
    )

    with open(merged_dir / "README.md", "w", encoding="utf-8") as f:
        f.write(_readme(stats, args.repo_id))
    print(f"\n[OK] dataset written to {merged_dir}")
    return merged_dir


def upload_to_hub(merged_dir: Path, repo_id: str) -> None:
    token = os.environ.get("HF_TOKEN")
    if not token:
        print("error: set HF_TOKEN to upload", file=sys.stderr)
        sys.exit(1)
    from huggingface_hub import HfApi, login

    login(token=token)
    api = HfApi()
    # Clean old files (keep .gitattributes), then upload README + configs.
    try:
        for f in api.list_repo_files(repo_id=repo_id, repo_type="dataset"):
            if f != ".gitattributes":
                try:
                    api.delete_file(path_in_repo=f, repo_id=repo_id, repo_type="dataset")
                    print(f"   deleted: {f}")
                except Exception:
                    pass
    except Exception:
        pass
    api.upload_file(
        path_or_fileobj=str(merged_dir / "README.md"),
        path_in_repo="README.md",
        repo_id=repo_id,
        repo_type="dataset",
    )
    for config in ("full", "no-ai", "sam3"):
        print(f"   uploading {config} ...")
        api.upload_folder(
            folder_path=str(merged_dir / config),
            path_in_repo=config,
            repo_id=repo_id,
            repo_type="dataset",
        )
    print(f"[OK] https://huggingface.co/datasets/{repo_id}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="VOC -> HF parquet converter/uploader")
    p.add_argument("--voc-original", default="./raw_datasets/VOCdevkit/VOC2012")
    p.add_argument("--voc-no-ai", default="./raw_datasets/VOCdevkit_no_ai/VOC2012")
    p.add_argument("--voc-sam3", default="./raw_datasets/VOCdevkit_SAM3/VOC2012")
    p.add_argument("--output-dir", default="./hf_datasets")
    p.add_argument("--repo-id", default="tari-tech/13803867589-unet-image-seg")
    p.add_argument("--upload", action=argparse.BooleanOptionalAction, default=False,
                   help="Push to the HF hub after converting (needs HF_TOKEN)")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    merged = create_merged_dataset(args)
    if args.upload:
        upload_to_hub(merged, args.repo_id)
