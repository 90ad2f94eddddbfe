"""ResNet50-encoder U-Net (parity: /root/reference/model/unet_resnet.py).

Decoder: 4 UnetUpNoBN stages over in_filters [192, 512, 1024, 3072] ->
out_filters [64, 128, 256, 512] (skip+up channel sums), plus a final x2
upsample head restoring full resolution and a 1x1 class head.

``decoder_width`` is a TPU-native opt-in (NOT in the reference): the parity
decoder's C=64 full-resolution tail caps the MXU near ~45% utilization at
512^2 on v5e (ROADMAP.md perf table; docs/negative-results #1-#8 measured
every same-width formulation), so the one remaining lever is width itself.
decoder_width=2.0 gives a [128, 256, 512, 1024] decoder — more FLOPs per
step, but at far better TF/s. Checkpoints are width-specific; the default
(1.0) is the reference-parity architecture.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.models.blocks import ClassHead, FinalUpConv, UnetUpNoBN
from unet_embroidery_seg_tpu.models.resnet_backbone import ResNet50Backbone


class UNetResNet50(nn.Module):
    num_classes: int = 21  # VOC-legacy default, matching unet_resnet.py:47
    dtype: jnp.dtype | None = None
    diff_head: bool = False  # binary train fast path (ClassHead.diff)
    decoder_width: float = 1.0  # opt-in width multiplier (module docstring)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat1, feat2, feat3, feat4, feat5 = ResNet50Backbone(
            dtype=self.dtype, name="resnet"
        )(x, train)

        out_filters = tuple(
            int(f * self.decoder_width) for f in (64, 128, 256, 512)
        )
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
        logits = ClassHead(
            self.num_classes,
            diff=self.diff_head,
            dtype=self.dtype,
            name="final",
        )(up1)
        return logits.astype(jnp.float32)
