"""predict.py CLI paths: single-image loop vs --batch directory mode.

The batch mode amortizes device round-trips (predict.py:detect_batch); it
must produce byte-identical masks to the reference-parity per-image loop,
including on a final partial chunk (padded rows discarded).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax

import predict as predict_cli
from unet_embroidery_seg_tpu.engine import checkpoint
from unet_embroidery_seg_tpu.models import build_model, init_model


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("predict")
    rng = np.random.RandomState(0)
    img_dir = root / "imgs"
    img_dir.mkdir()
    for i, (w, h) in enumerate([(40, 30), (28, 44), (36, 36)]):
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(img_dir / f"s{i}.jpg")
    model = build_model("unet_plain", num_classes=2)
    variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
    weights = root / "w.msgpack"
    checkpoint.save_variables(str(weights), variables)
    return img_dir, weights


def _run(img_dir, weights, extra, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    args = predict_cli.parse_args(
        [
            "--data_path", str(img_dir),
            "--weights", str(weights),
            "--model", "unet_plain",
            "--num-classes", "1",
            "--input-size", "32",
            "--no-amp",
        ]
        + extra
    )
    out = predict_cli.predict(args)
    return {
        f: np.array(Image.open(os.path.join(out, f)))
        for f in sorted(os.listdir(out))
        if f.endswith("_mask.png")
    }


def test_batch_mode_matches_per_image(tiny_setup, monkeypatch, tmp_path):
    img_dir, weights = tiny_setup
    single = _run(img_dir, weights, [], monkeypatch, tmp_path)
    batched = _run(img_dir, weights, ["--batch", "2"], monkeypatch, tmp_path)
    assert set(single) == set(batched) and len(single) == 3
    for name in single:  # 3 images, batch 2 => exercises the padded tail
        np.testing.assert_array_equal(single[name], batched[name])
