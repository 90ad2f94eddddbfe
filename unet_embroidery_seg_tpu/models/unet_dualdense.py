"""Dense-block U-Net (parity: /root/reference/model/unet_dualdense.py).

Every stage is a DenseNet-style block (growth_rate=32, num_layers=3,
concat-everything) followed by a 1x1 transition; same 5-down/4-up topology
as UNetPlain.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.models.blocks import ClassHead, DenseConvBlock, UpDense
from unet_embroidery_seg_tpu.ops.resize import max_pool


class DualDenseUNet(nn.Module):
    num_classes: int = 2
    base_channels: int = 64
    growth_rate: int = 32
    num_layers: int = 3
    dtype: jnp.dtype | None = None
    diff_head: bool = False  # binary train fast path (ClassHead.diff)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, g, nl = self.base_channels, self.growth_rate, self.num_layers

        def down(x, feats, name):
            x = max_pool(x, 2, 2)
            return DenseConvBlock(feats, g, nl, dtype=self.dtype, name=name)(x, train)

        x1 = DenseConvBlock(c, g, nl, dtype=self.dtype, name="inc")(x, train)
        x2 = down(x1, c * 2, "down1")
        x3 = down(x2, c * 4, "down2")
        x4 = down(x3, c * 8, "down3")
        x5 = down(x4, c * 16, "down4")

        x = UpDense(c * 8, g, nl, dtype=self.dtype, name="up1")(x5, x4, train)
        x = UpDense(c * 4, g, nl, dtype=self.dtype, name="up2")(x, x3, train)
        x = UpDense(c * 2, g, nl, dtype=self.dtype, name="up3")(x, x2, train)
        x = UpDense(c, g, nl, dtype=self.dtype, name="up4")(x, x1, train)

        logits = ClassHead(
            self.num_classes,
            diff=self.diff_head,
            dtype=self.dtype,
            name="outc",
        )(x)
        return logits.astype(jnp.float32)
