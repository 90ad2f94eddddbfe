"""packed_tail ops == their unpacked equivalents, exactly (f32 on CPU).

The packed decoder tail (ops/packed_tail.py) claims numerical equivalence
with upsample2x + conv3x3 + 1x1 head at 2H×2W; these tests pin that claim
leaf by leaf so the perf rewrite can never drift from the reference
semantics (unet_resnet.py:70-78).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops import packed_tail as pt
from unet_embroidery_seg_tpu.ops.resize import upsample2x

rng = np.random.RandomState(7)


def _conv3x3(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y if b is None else y + b


class TestPackedLayout:
    def test_space_depth_roundtrip(self):
        x = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(pt.depth_to_space2(pt.space_to_depth2(x))), np.asarray(x)
        )

    def test_phase_order_pqc(self):
        """Packed channel (p*2+q)*C + c holds pixel (2i+p, 2j+q, c)."""
        x = jnp.asarray(rng.rand(1, 4, 4, 2), jnp.float32)
        packed = np.asarray(pt.space_to_depth2(x))
        xn = np.asarray(x)
        for p in (0, 1):
            for q in (0, 1):
                for c in (0, 1):
                    np.testing.assert_array_equal(
                        packed[0, :, :, (p * 2 + q) * 2 + c],
                        xn[0, p::2, q::2, c],
                    )

    def test_labels_match_logits_phases(self):
        y = jnp.asarray(rng.randint(0, 2, (2, 8, 8)), jnp.int32)
        pl = np.asarray(pt.space_to_depth2_labels(y))
        # packing the labels with C=1 logits packing must agree
        pl2 = np.asarray(pt.space_to_depth2(y[..., None].astype(jnp.float32)))
        np.testing.assert_array_equal(pl.astype(np.float32), pl2)


class TestPackedOpsExact:
    @pytest.mark.parametrize("align", [True, False])
    def test_packed_upsample(self, align):
        x = jnp.asarray(rng.rand(2, 16, 16, 8), jnp.float32)
        ref = upsample2x(x, align_corners=align)
        packed = pt.packed_upsample2x(x, align_corners=align)
        np.testing.assert_allclose(
            np.asarray(pt.depth_to_space2(packed)), np.asarray(ref),
            rtol=1e-6, atol=1e-6,
        )

    def test_packed_conv3x3(self):
        x = jnp.asarray(rng.randn(2, 32, 32, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 5) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(5) * 0.1, jnp.float32)
        ref = _conv3x3(x, w, b)
        got = pt.depth_to_space2(
            pt.packed_conv3x3(pt.space_to_depth2(x), w, b)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_packed_conv1x1(self):
        x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
        w = jnp.asarray(rng.randn(1, 1, 8, 3) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
        ref = jnp.einsum("bhwc,co->bhwo", x, w[0, 0]) + b
        got = pt.depth_to_space2(
            pt.packed_conv1x1(pt.space_to_depth2(x), w, b)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_full_tail_equivalence(self):
        """upsample -> conv -> relu -> conv -> relu -> head, both paths."""
        x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
        w1 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        wh = jnp.asarray(rng.randn(1, 1, 8, 2) * 0.2, jnp.float32)
        bh = jnp.asarray(rng.randn(2) * 0.1, jnp.float32)

        u = upsample2x(x, align_corners=True)
        y = jax.nn.relu(_conv3x3(u, w1, b1))
        y = jax.nn.relu(_conv3x3(y, w2, b2))
        ref = jnp.einsum("bhwc,co->bhwo", y, wh[0, 0]) + bh

        up = pt.packed_upsample2x(x, align_corners=True)
        yp = jax.nn.relu(pt.packed_conv3x3(up, w1, b1))
        yp = jax.nn.relu(pt.packed_conv3x3(yp, w2, b2))
        got = pt.depth_to_space2(pt.packed_conv1x1(yp, wh, bh))

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        """Same loss -> same parameter gradients through both paths."""
        x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.2, jnp.float32)
        tgt = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)

        def loss_ref(w):
            y = _conv3x3(upsample2x(x, align_corners=True), w)
            return jnp.sum((y - tgt) ** 2)

        def loss_packed(w):
            y = pt.packed_conv3x3(pt.packed_upsample2x(x, align_corners=True), w, None)
            return jnp.sum((pt.depth_to_space2(y) - tgt) ** 2)

        g_ref = jax.grad(loss_ref)(w)
        g_packed = jax.grad(loss_packed)(w)
        np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)
