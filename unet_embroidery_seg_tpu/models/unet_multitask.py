"""Multitask seg+cls U-Net (parity: /root/reference/model/unet_multitask.py).

Shared ResNet50 encoder; seg decoder identical to unet_resnet (1-channel seg
head); classification head on feat5: GAP -> Dense(2048->512) -> ReLU ->
Dropout(0.5) -> Dense(512->num_cls).

Returns ``(seg_logits [N,H,W,1], cls_logits [N,num_cls])``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.models.blocks import FinalUpConv, UnetUpNoBN, conv_init
from unet_embroidery_seg_tpu.models.resnet_backbone import ResNet50Backbone
from unet_embroidery_seg_tpu.ops.resize import adaptive_avg_pool_1x1


class MultiTaskUNet(nn.Module):
    num_seg_classes: int = 1
    num_cls_classes: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat1, feat2, feat3, feat4, feat5 = ResNet50Backbone(
            dtype=self.dtype, name="encoder"
        )(x, train)

        # Classification branch on the deepest features.
        h = adaptive_avg_pool_1x1(feat5)
        h = nn.Dense(512, dtype=self.dtype, name="cls_fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train, name="cls_dropout")(h)
        cls_logits = nn.Dense(self.num_cls_classes, dtype=self.dtype, name="cls_fc2")(h)

        # Segmentation decoder (same shape as unet_resnet's).
        out_filters = (64, 128, 256, 512)
        up4 = UnetUpNoBN(out_filters[3], dtype=self.dtype, name="up_concat4")(
            feat4, feat5, train
        )
        up3 = UnetUpNoBN(out_filters[2], dtype=self.dtype, name="up_concat3")(
            feat3, up4, train
        )
        up2 = UnetUpNoBN(out_filters[1], dtype=self.dtype, name="up_concat2")(
            feat2, up3, train
        )
        up1 = UnetUpNoBN(out_filters[0], dtype=self.dtype, name="up_concat1")(
            feat1, up2, train
        )
        up1 = FinalUpConv(out_filters[0], dtype=self.dtype, name="up_conv")(up1)

        seg_logits = nn.Conv(
            self.num_seg_classes,
            (1, 1),
            use_bias=True,
            kernel_init=conv_init,
            dtype=self.dtype,
            name="seg_head",
        )(up1)
        return seg_logits.astype(jnp.float32), cls_logits.astype(jnp.float32)
