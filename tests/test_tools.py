"""Offline data-prep tool tests: splitter, labelme converter, HF converter.

The reference has no tests (SURVEY.md §4); these pin the tool behaviors the
training pipeline depends on: deterministic splits, correct mask
rasterization/palette, parquet with embedded bytes, and label-prefix
extraction (convert_and_upload.py:36-44 semantics).
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataset_splitter import split_dataset
from labelme_converter import convert, get_voc_palette, shapes_to_label
from convert_and_upload import get_label_from_filename


@pytest.fixture
def voc_tree(tmp_path):
    root = tmp_path / "VOC2012"
    jp = root / "JPEGImages"
    jp.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = [f"动物类{i:03d}" for i in range(7)] + [f"植物类{i:03d}" for i in range(3)]
    for n in names:
        w, h = 50, 40
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(jp / f"{n}.jpg")
        shape = {
            "label": "chicken",
            "shape_type": "polygon",
            "points": [[5, 5], [w - 10, 8], [w // 2, h - 10]],
        }
        with open(jp / f"{n}.json", "w", encoding="utf-8") as f:
            json.dump(
                {"imagePath": f"{n}.jpg", "imageHeight": h, "imageWidth": w,
                 "shapes": [shape]},
                f,
            )
    return root


class TestSplitter:
    def test_ratios_and_determinism(self, voc_tree):
        # needs masks to split over
        convert(str(voc_tree), ["_background_", "chicken"], seed=3)
        a = split_dataset(str(voc_tree), seed=7)
        b = split_dataset(str(voc_tree), seed=7)
        assert a == b
        assert len(a["train"]) == 7 and len(a["val"]) == 2 and len(a["test"]) == 1
        all_ids = a["train"] + a["val"] + a["test"]
        assert len(set(all_ids)) == 10

    def test_txt_files_written(self, voc_tree):
        convert(str(voc_tree), ["_background_", "chicken"], seed=3)
        sets = voc_tree / "ImageSets" / "Segmentation"
        for split in ("train", "val", "test"):
            assert (sets / f"{split}.txt").exists()


class TestLabelme:
    def test_polygon_rasterization(self):
        label = shapes_to_label(
            (20, 20),
            [{"label": "fg", "shape_type": "polygon",
              "points": [[2, 2], [17, 2], [17, 17], [2, 17]]}],
            {"_background_": 0, "fg": 1},
        )
        assert label[10, 10] == 1  # inside
        assert label[0, 0] == 0  # outside
        assert label.shape == (20, 20)

    def test_rectangle_and_circle(self):
        label = shapes_to_label(
            (30, 30),
            [
                {"label": "a", "shape_type": "rectangle", "points": [[1, 1], [10, 10]]},
                {"label": "b", "shape_type": "circle", "points": [[20, 20], [24, 20]]},
            ],
            {"a": 1, "b": 2},
        )
        assert label[5, 5] == 1
        assert label[20, 20] == 2

    def test_voc_palette_known_values(self):
        p = get_voc_palette(256)
        assert p[0:3] == [0, 0, 0]  # class 0 = black
        assert p[3:6] == [128, 0, 0]  # class 1 = maroon (VOC standard)
        assert p[6:9] == [0, 128, 0]  # class 2 = green

    def test_converted_masks_are_binaryish(self, voc_tree):
        n = convert(str(voc_tree), ["_background_", "chicken"], seed=0)
        assert n == 10
        masks = list((voc_tree / "SegmentationClass").glob("*.png"))
        assert len(masks) == 10
        m = np.array(Image.open(masks[0]))
        assert set(np.unique(m)) <= {0, 1}


class TestConvert:
    def test_label_prefix_extraction(self):
        assert get_label_from_filename("动物类123.jpg") == "动物类"
        assert get_label_from_filename("abc99.png") == "abc"
        assert get_label_from_filename("123.png") == "unknown"

    def test_parquet_embeds_bytes(self, voc_tree, tmp_path):
        convert(str(voc_tree), ["_background_", "chicken"], seed=0)
        from convert_and_upload import convert_voc, _write_config

        ds = convert_voc(voc_tree, "full")
        sizes = _write_config(ds, tmp_path / "full")
        assert sizes["train"] == 7
        import pyarrow.parquet as pq

        t = pq.read_table(tmp_path / "full" / "train" / "data.parquet")
        first = t.column("image")[0].as_py()
        assert first["bytes"] is not None and len(first["bytes"]) > 0

    def test_roundtrip_through_training_source(self, voc_tree, tmp_path):
        """The written parquet must load through HFParquetSource."""
        convert(str(voc_tree), ["_background_", "chicken"], seed=0)
        from convert_and_upload import convert_voc, _write_config
        from unet_embroidery_seg_tpu.data.sources import HFParquetSource

        _write_config(convert_voc(voc_tree, "full"), tmp_path / "ds" / "full")
        src = HFParquetSource(
            str(tmp_path / "ds"), config="full", split="train",
            cache_dir=str(tmp_path / "cache"),
        )
        assert len(src) == 7
        s = src[0]
        assert s["image"].mode == "RGB" and s["mask"].mode == "L"
        assert s["label"] in ("动物类", "植物类")
