"""Plain U-Net (parity target: /root/reference/model/unet_plain.py).

5 encoder levels of DoubleConv (64->1024 at base_channels=64), MaxPool downs,
bilinear-upsample + center-pad + skip-concat decoder, 1x1 head.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.models.blocks import ClassHead, DoubleConv, Down, UpPlain


class UNetPlain(nn.Module):
    num_classes: int = 2
    base_channels: int = 64
    dtype: jnp.dtype | None = None
    diff_head: bool = False  # binary train fast path (ClassHead.diff)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        x1 = DoubleConv(c, dtype=self.dtype, name="inc")(x, train)
        x2 = Down(c * 2, dtype=self.dtype, name="down1")(x1, train)
        x3 = Down(c * 4, dtype=self.dtype, name="down2")(x2, train)
        x4 = Down(c * 8, dtype=self.dtype, name="down3")(x3, train)
        x5 = Down(c * 16, dtype=self.dtype, name="down4")(x4, train)

        x = UpPlain(c * 8, dtype=self.dtype, name="up1")(x5, x4, train)
        x = UpPlain(c * 4, dtype=self.dtype, name="up2")(x, x3, train)
        x = UpPlain(c * 2, dtype=self.dtype, name="up3")(x, x2, train)
        x = UpPlain(c, dtype=self.dtype, name="up4")(x, x1, train)

        logits = ClassHead(
            self.num_classes,
            diff=self.diff_head,
            dtype=self.dtype,
            name="outc",
        )(x)
        return logits.astype(jnp.float32)
