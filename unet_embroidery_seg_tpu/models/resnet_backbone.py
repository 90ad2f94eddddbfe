"""ResNet-50 multi-feature backbone (parity: /root/reference/model/resnet_backbone.py).

Returns 5 feature maps [feat1..feat5] with channels [64, 256, 512, 1024, 2048]
at strides [2, 4, 8, 16, 32]. Two deliberate reference quirks are preserved:

  - the stem maxpool is 3x3 stride 2 with padding=0 and ceil_mode=True
    (resnet_backbone.py:131) — NOT the torchvision padding=1 variant; border
    values differ and the 256->128 shape only works out through ceil mode;
  - feat1 is taken *before* the maxpool (post conv7x7+BN+ReLU).

NHWC, bias-free convs + BN exactly as the reference. Note train.py applies
``weights_init`` over the whole net (train.py:54), overriding the He init in
the reference constructor — so our conv_init/bn_scale_init defaults match the
weights that actually get trained.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.models.blocks import (
    BatchNorm,
    StemConv7x7,
    conv1x1,
    conv3x3,
    conv_init,
)
from unet_embroidery_seg_tpu.ops.resize import max_pool


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 (stride) -> 1x1 expand(x4), residual add, ReLU."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: jnp.dtype | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv1x1(self.planes, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3x3(self.planes, stride=self.stride, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = conv1x1(self.planes * self.expansion, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, train)
        if self.use_downsample:
            identity = conv1x1(
                self.planes * self.expansion,
                stride=self.stride,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResNet50Backbone(nn.Module):
    """Stem + 4 stages of (3, 4, 6, 3) bottlenecks, multi-feature forward."""

    dtype: jnp.dtype | None = None
    layers: tuple[int, ...] = (3, 4, 6, 3)
    # Stem lowering (StemConv7x7 modes; param tree identical either way, so
    # this can flip without breaking checkpoints):
    #   "direct" = plain 7x7 s2 conv;
    #   "packed" = space-to-depth 4x4 s1 (wins isolated — fwd 2.16->1.76 ms,
    #     wgrad 0.99->0.27 — but ~1.7 ms SLOWER in the full step: the packing
    #     transpose doesn't fuse with the augmentation producer);
    #   "im2col" = materialized 49-slice im2col + one K=147 GEMM.
    stem_mode: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: conv7x7 s2 p3 (bias-free) -> BN -> ReLU = feat1.
        if self.stem_mode != "direct":
            x = StemConv7x7(
                64, dtype=self.dtype, mode=self.stem_mode, name="conv1"
            )(x)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
                name="conv1",
            )(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        feat1 = nn.relu(x)

        # The quirky ceil-mode maxpool (see module docstring).
        x = max_pool(feat1, 3, 2, padding=0, ceil_mode=True)

        feats = [feat1]
        planes = (64, 128, 256, 512)
        inplanes = 64
        for stage, (blocks, p) in enumerate(zip(self.layers, planes), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                use_ds = b == 0 and (stride != 1 or inplanes != p * 4)
                x = Bottleneck(
                    p,
                    stride=stride if b == 0 else 1,
                    use_downsample=use_ds,
                    dtype=self.dtype,
                    name=f"layer{stage}_block{b}",
                )(x, train)
                inplanes = p * 4
            feats.append(x)

        return feats  # [feat1, feat2, feat3, feat4, feat5]
