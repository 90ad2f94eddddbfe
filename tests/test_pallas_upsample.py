"""Pallas upsample kernel: exactness vs the einsum reference (TPU only).

The kernel is an opt-in reference implementation (see its docstring for the
measured negative perf result); correctness still matters because it
documents the halo-DMA pattern. CPU CI skips it (Pallas TPU kernels need a
TPU backend or interpret mode; interpret mode can't exercise the DMA path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops.resize import resize_bilinear

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs a TPU backend",
)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((2, 32, 32, 128), jnp.float32),
        ((2, 16, 16, 2048), jnp.bfloat16),
        ((2, 64, 64, 256), jnp.bfloat16),
    ],
)
def test_matches_einsum(shape, dtype, align_corners):
    from unet_embroidery_seg_tpu.ops.pallas_upsample import upsample2x_pallas

    x = jnp.asarray(np.random.RandomState(0).rand(*shape), dtype)
    got = upsample2x_pallas(x, align_corners=align_corners).astype(jnp.float32)
    ref = resize_bilinear(
        x.astype(jnp.float32), (2 * shape[1], 2 * shape[2]),
        align_corners=align_corners,
    )
    tol = 1e-5 if dtype == jnp.float32 else 4e-3
    assert float(jnp.max(jnp.abs(got - ref))) < tol


def test_gradient_matches():
    from unet_embroidery_seg_tpu.ops.pallas_upsample import upsample2x_pallas

    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 128), jnp.float32)
    g = jax.grad(lambda z: jnp.sum(upsample2x_pallas(z, align_corners=True) ** 2))(x)
    gr = jax.grad(lambda z: jnp.sum(resize_bilinear(z, (64, 64), align_corners=True) ** 2))(x)
    assert float(jnp.max(jnp.abs(g - gr))) < 1e-4
