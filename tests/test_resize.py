"""Resize/pool parity tests vs torch (both align_corners modes + ceil pool)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops import resize


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


class TestBilinear:
    def test_upsample2x_align_false(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 7, 9, 3).astype(np.float32)
        expected = _to_nhwc(
            F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
        )
        got = np.asarray(resize.upsample2x(jnp.asarray(x), align_corners=False))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_upsample2x_align_true(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 8, 8, 4).astype(np.float32)
        expected = _to_nhwc(
            F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
        )
        got = np.asarray(resize.upsample2x(jnp.asarray(x), align_corners=True))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_arbitrary_resize(self):
        rng = np.random.RandomState(2)
        x = rng.randn(1, 13, 17, 2).astype(np.float32)
        for ac in (False, True):
            expected = _to_nhwc(
                F.interpolate(_nchw(x), size=(20, 11), mode="bilinear", align_corners=ac)
            )
            got = np.asarray(resize.resize_bilinear(jnp.asarray(x), (20, 11), align_corners=ac))
            np.testing.assert_allclose(got, expected, atol=1e-5)


class TestMaxPool:
    def test_2x2_stride2(self):
        rng = np.random.RandomState(3)
        x = rng.randn(2, 16, 16, 3).astype(np.float32)
        expected = _to_nhwc(F.max_pool2d(_nchw(x), 2, 2))
        got = np.asarray(resize.max_pool(jnp.asarray(x), 2, 2))
        np.testing.assert_allclose(got, expected, atol=0)

    def test_resnet_stem_ceil_mode(self):
        # MaxPool2d(3, stride=2, padding=0, ceil_mode=True): 256 -> 128
        # (resnet_backbone.py:131 quirk; standard torchvision gives 128 via
        # padding=1 ceil_mode=False — different values at the border!)
        rng = np.random.RandomState(4)
        for size in (256, 128, 17, 10):
            x = rng.randn(1, size, size, 2).astype(np.float32)
            expected = _to_nhwc(
                F.max_pool2d(_nchw(x), 3, stride=2, padding=0, ceil_mode=True)
            )
            got = np.asarray(resize.max_pool(jnp.asarray(x), 3, 2, 0, ceil_mode=True))
            assert got.shape == expected.shape, f"size={size}"
            np.testing.assert_allclose(got, expected, atol=0)


class TestCenterPad:
    def test_pads_like_reference_up(self):
        # unet_plain.py:42-45: pad [dw//2, dw-dw//2, dh//2, dh-dh//2]
        x = np.arange(2 * 3 * 3 * 1, dtype=np.float32).reshape(2, 3, 3, 1)
        got = np.asarray(resize.center_pad_to(jnp.asarray(x), (6, 5)))
        expected = F.pad(_nchw(x), [1, 1, 1, 2])  # dw=2 -> (1,1); dh=3 -> (1,2)
        np.testing.assert_allclose(got, _to_nhwc(expected), atol=0)
