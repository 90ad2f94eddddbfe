"""On-device augmentation: correctness vs the host reference path.

Contract (ops/device_augment.py docstring): *statistical* parity with the
host PIL/cv2 pipeline — same augmentation distribution, not bit equality —
plus exact equality for the deterministic eval path and the HSV color math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.data import SegmentationDataset
from unet_embroidery_seg_tpu.data.augment import _hsv_to_rgb_u8, _rgb_to_hsv_u8
from unet_embroidery_seg_tpu.data.cache import CanvasCache
from unet_embroidery_seg_tpu.data.sources import SyntheticSource
from unet_embroidery_seg_tpu.ops import device_augment as da

SIZE = 64


@pytest.fixture(scope="module")
def cache():
    src = SyntheticSource(split="train", length=12)
    return CanvasCache(src, (SIZE, SIZE), verbose=False)


class TestEvalPath:
    def test_matches_host_letterbox_exactly(self, cache):
        src = SyntheticSource(split="train", length=12)
        ds = SegmentationDataset(src, (SIZE, SIZE), 2, augmentation=False, task="binary")
        img_d, mask_d = da.preprocess_eval_batch(
            jnp.asarray(cache.images[:4]), jnp.asarray(cache.masks[:4])
        )
        for i in range(4):
            jpg, png, _ = ds.get(i)
            np.testing.assert_allclose(np.asarray(img_d[i]), jpg, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(mask_d[i]), png)


class TestHSV:
    def test_roundtrip_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 256, (8, 8, 3), np.uint8)
        h, s, v = da.rgb_to_hsv_cv(jnp.asarray(rgb, jnp.float32) / 255.0)
        ref = _rgb_to_hsv_u8(rgb)
        # float vs uint8-rounded reference: within one quantization step
        assert np.abs(np.asarray(h) - ref[..., 0].astype(np.float32)).max() <= 1.0
        assert np.abs(np.asarray(s) - ref[..., 1].astype(np.float32)).max() <= 1.0
        assert np.abs(np.asarray(v) - ref[..., 2].astype(np.float32)).max() <= 1.0
        back = da.hsv_to_rgb_cv(h, s, v)
        np.testing.assert_allclose(
            np.asarray(back), rgb.astype(np.float32) / 255.0, atol=2 / 255
        )

    def test_identity_gains_are_noop(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
        out = da.hsv_jitter_device(img, jnp.ones((2, 3)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-5)


class TestAugmentBatch:
    def test_shapes_dtypes_determinism(self, cache):
        key = jax.random.PRNGKey(3)
        img, mask = da.augment_batch(
            jnp.asarray(cache.images[:4]), jnp.asarray(cache.masks[:4]),
            jnp.asarray(cache.valid_wh[:4]), key, out_hw=(SIZE, SIZE),
        )
        assert img.shape == (4, SIZE, SIZE, 3) and img.dtype == jnp.float32
        assert mask.shape == (4, SIZE, SIZE) and mask.dtype == jnp.int32
        assert set(np.unique(np.asarray(mask))) <= {0, 1}
        img2, mask2 = da.augment_batch(
            jnp.asarray(cache.images[:4]), jnp.asarray(cache.masks[:4]),
            jnp.asarray(cache.valid_wh[:4]), key, out_hw=(SIZE, SIZE),
        )
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))

    def test_outputs_in_range(self, cache):
        img, _ = da.augment_batch(
            jnp.asarray(cache.images), jnp.asarray(cache.masks),
            jnp.asarray(cache.valid_wh), jax.random.PRNGKey(0), out_hw=(SIZE, SIZE),
        )
        a = np.asarray(img)
        assert a.min() >= 0.0 and a.max() <= 1.0

    def test_statistical_parity_with_host(self, cache):
        """Foreground fraction + image mean distributions must match the host
        augmentation over many draws (loose 3-sigma-ish tolerances)."""
        src = SyntheticSource(split="train", length=12)
        ds = SegmentationDataset(src, (SIZE, SIZE), 2, augmentation=True,
                                 task="binary", seed=0)
        host_fg, host_mean = [], []
        for epoch in range(6):
            for i in range(12):
                jpg, png, _ = ds.get(i, epoch)
                host_fg.append(png.mean())
                host_mean.append(jpg.mean())
        dev_fg, dev_mean = [], []
        for epoch in range(6):
            img, mask = da.augment_batch(
                jnp.asarray(cache.images), jnp.asarray(cache.masks),
                jnp.asarray(cache.valid_wh), jax.random.PRNGKey(epoch),
                out_hw=(SIZE, SIZE),
            )
            dev_fg.extend(np.asarray(mask).mean(axis=(1, 2)))
            dev_mean.extend(np.asarray(img).mean(axis=(1, 2, 3)))
        assert abs(np.mean(host_fg) - np.mean(dev_fg)) < 0.05
        assert abs(np.mean(host_mean) - np.mean(dev_mean)) < 0.05
        assert abs(np.std(host_fg) - np.std(dev_fg)) < 0.06
