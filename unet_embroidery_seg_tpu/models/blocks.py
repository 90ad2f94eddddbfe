"""Shared Flax building blocks for the U-Net zoo (NHWC, bf16-friendly).

Design notes (TPU-first, not a torch translation):
  - NHWC layout everywhere: TPU convolutions are natively NHWC; the channel
    dim rides the 128-wide lane dimension of the VPU/MXU.
  - ``dtype`` is the compute dtype (bf16 for the AMP analogue of
    train.py:170's GradScaler — bf16 needs no loss scaling); ``param_dtype``
    stays float32 (master weights). BatchNorm statistics are always f32.
  - Initialization mirrors the reference's ``weights_init`` 'normal' scheme
    (unet_training.py:94-113): conv kernels ~ N(0, 0.02), BN scale ~
    N(1, 0.02), biases 0 — which train.py applies over *every* model,
    including the ResNet backbone (train.py:54).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_embroidery_seg_tpu.ops.resize import center_pad_to, max_pool, upsample2x

# Reference 'normal' init: N(0, 0.02) for convs (unet_training.py:98-99).
conv_init = nn.initializers.normal(stddev=0.02)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BN scale ~ N(1, 0.02) (unet_training.py:108-110)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def conv3x3(features: int, *, stride: int = 1, use_bias: bool = False, dtype=None, name=None):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=use_bias,
        kernel_init=conv_init,
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, *, stride: int = 1, use_bias: bool = False, dtype=None, name=None):
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        use_bias=use_bias,
        kernel_init=conv_init,
        dtype=dtype,
        name=name,
    )


class StemConv7x7(nn.Module):
    """7x7 stride-2 pad-3 bias-free stem conv, lowered space-to-depth packed.

    A 3-channel 7x7 conv starves the MXU (~7 TF/s measured on v5e: the
    contraction dim is 7*7*3). Packing the input 2x2 space-to-depth turns it
    into an exactly-equivalent 4x4 stride-1 conv over 12 channels:

        out[i,j] = sum_{a,b} w[a,b] . x[2i+a-3, 2j+b-3]
                 = sum_{q,r,dy,dx} wp[q+2,r+2,(dy,dx,.)] . xp[i+q, j+r, (dy,dx,.)]

    with a = 2q+dy+3 and wp the zero-padded rearrangement of w (entries with
    a outside [0,7) are zero). Measured on v5e (b8, 512^2, bf16): fwd 2.16 ->
    1.76 ms, wgrad 0.99 -> 0.27 ms vs the direct 7x7 lowering.

    The parameter keeps the reference shape (7,7,3,C) so checkpoints are
    interchangeable with a plain conv; the rearrangement happens per call and
    gradients flow through it. Odd H/W falls back to the direct lowering.
    """

    features: int
    dtype: jnp.dtype | None = None
    mode: str = "packed"  # "packed" | "im2col" | "direct"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", conv_init, (7, 7, c_in, self.features))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        w = kernel.astype(dtype)
        n, h, wd, _ = x.shape
        if h % 2 or wd % 2 or self.mode == "direct":
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.mode == "im2col":
            # Materialized im2col + one GEMM: the 49 strided slices fuse
            # into a single loop fusion and the contraction runs K=147 on
            # the MXU instead of the channel-starved (C_in=3) conv emitter.
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            cols = [
                xp[:, ky : ky + h : 2, kx : kx + wd : 2, :]
                for ky in range(7)
                for kx in range(7)
            ]
            a = jnp.concatenate(cols, axis=-1)  # [n, h/2, w/2, 49*c_in]
            return jnp.einsum(
                "nhwk,kc->nhwc", a, w.reshape(49 * c_in, self.features),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        xp = x.reshape(n, h // 2, 2, wd // 2, 2, c_in)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, wd // 2, 4 * c_in)
        wpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # a = 2q+dy-1 over [-1,7)
        wp = wpad.reshape(4, 2, 4, 2, c_in, self.features)
        wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c_in, self.features)
        return jax.lax.conv_general_dilated(
            xp, wp, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ClassHead(nn.Module):
    """1x1 class head, parameter-compatible with ``nn.Conv`` ('kernel' of
    shape (1, 1, C, num_classes) + 'bias') so checkpoints interchange freely.

    ``diff=True`` (binary training fast path): returns the LOGIT DIFFERENCE
    ``logits[..., 1] - logits[..., 0]`` as an (N, H, W) array, computed as a
    single matvec with (w1 - w0, b1 - b0). BCE, Lovasz-hinge, and the binary
    confusion metrics only ever consume this difference
    (losses.binary_logits_from_two_class), but materializing the 2-channel
    tensor first costs ~3.6 ms/step at 512^2 b8 on v5e — XLA tiles the
    2-channel minor dim at T(2,128), so the head's fwd (0.95 ms), dgrad
    (1.79 ms) and wgrad (0.89 ms) all run far below bandwidth. The diff
    matvec moves only the (N, H, W, C) input once each way (~1.3 ms total).
    Under the AMP training default the stored params are bf16 compute copies
    (TreeAdam keeps the f32 masters in opt_state), so the subtraction is
    bf16-rounded — at most one ulp of the difference, far below the loss
    noise floor; with ``--no-amp`` (f32 params) it is exact.
    """

    num_classes: int
    diff: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", conv_init, (1, 1, c_in, self.num_classes))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.num_classes,))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.diff:
            if self.num_classes != 2:
                raise ValueError("diff head requires num_classes == 2")
            wd = (kernel[0, 0, :, 1] - kernel[0, 0, :, 0]).astype(dtype)
            bd = (bias[1] - bias[0]).astype(dtype)
            return jnp.einsum("nhwc,c->nhw", x, wd) + bd
        w = kernel[0, 0].astype(dtype)
        return jnp.einsum("nhwc,cd->nhwd", x, w) + bias.astype(dtype)


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (momentum 0.1, eps 1e-5).

    flax momentum is the running-average retention factor, so torch's 0.1
    becomes 0.9 here. Statistics are computed in f32 even under bf16 compute.
    Under a sharded batch, GSPMD turns the batch reduction into a cross-
    replica collective — i.e. synchronized BN over the data axis for free.
    """

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            scale_init=bn_scale_init,
            name="bn",
        )(x)


class DoubleConv(nn.Module):
    """2 x [conv3x3(bias-free) -> BN -> ReLU] (unet_plain.py:5-18)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv3x3(self.features, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="norm1")(x, train)
        x = nn.relu(x)
        x = conv3x3(self.features, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="norm2")(x, train)
        x = nn.relu(x)
        return x


class Down(nn.Module):
    """MaxPool(2,2) -> DoubleConv (unet_plain.py:21-30)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = max_pool(x, 2, 2)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class UpPlain(nn.Module):
    """Bilinear x2 (align_corners=False) + center-pad + skip-concat + DoubleConv.

    unet_plain.py:33-47: the concat order is [skip, x].
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = upsample2x(x, align_corners=False)
        if x.shape[-3:-1] != skip.shape[-3:-1]:
            x = center_pad_to(x, skip.shape[-3:-1])
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class UnetUpNoBN(nn.Module):
    """ResNet-U-Net decoder stage (unet_resnet.py:7-42, also multitask's copy).

    Bilinear x2 with align_corners=True (torch ``UpsamplingBilinear2d``),
    concat [skip, up(x)], then two biased conv3x3+ReLU — deliberately no BN,
    matching the reference decoder.
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, skip, x, train: bool):
        del train  # no normalization in this decoder stage
        x = upsample2x(x, align_corners=True)
        x = jnp.concatenate([skip, x], axis=-1)
        x = conv3x3(self.features, use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = conv3x3(self.features, use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        return x


class FinalUpConv(nn.Module):
    """Extra x2 upsample head restoring full resolution (unet_resnet.py:70-76)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = upsample2x(x, align_corners=True)
        x = conv3x3(self.features, use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = conv3x3(self.features, use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Additive spatial attention gate (unet_attention.py:7-35).

    alpha = sigmoid(BN(psi( relu(BN(theta(skip)) + BN(phi(gate))) ))),
    returns skip * alpha.
    """

    inter_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, skip, gate, train: bool):
        if skip.shape[-3:-1] != gate.shape[-3:-1]:
            from unet_embroidery_seg_tpu.ops.resize import resize_bilinear

            gate = resize_bilinear(gate, skip.shape[-3:-1], align_corners=False)
        theta = conv1x1(self.inter_features, dtype=self.dtype, name="theta")(skip)
        theta = BatchNorm(dtype=self.dtype, name="theta_bn")(theta, train)
        phi = conv1x1(self.inter_features, dtype=self.dtype, name="phi")(gate)
        phi = BatchNorm(dtype=self.dtype, name="phi_bn")(phi, train)
        f = nn.relu(theta + phi)
        psi = conv1x1(1, use_bias=True, dtype=self.dtype, name="psi")(f)
        psi = BatchNorm(dtype=self.dtype, name="psi_bn")(psi, train)
        alpha = nn.sigmoid(psi)
        return skip * alpha


class UpAttn(nn.Module):
    """Attention-gated decoder stage (unet_attention.py:38-55)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = upsample2x(x, align_corners=False)
        inter = max(self.features // 2, 16)
        skip = AttentionGate(inter, dtype=self.dtype, name="attn")(skip, x, train)
        if x.shape[-3:-1] != skip.shape[-3:-1]:
            from unet_embroidery_seg_tpu.ops.resize import resize_bilinear

            x = resize_bilinear(x, skip.shape[-3:-1], align_corners=False)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class DenseBlock(nn.Module):
    """DenseNet-style block: concat-everything growth (unet_dualdense.py:5-33).

    Each layer is BN -> ReLU -> conv3x3(growth_rate, bias-free) on the concat
    of all previous features.
    """

    growth_rate: int = 32
    num_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        features = [x]
        for i in range(self.num_layers):
            h = jnp.concatenate(features, axis=-1) if len(features) > 1 else x
            h = BatchNorm(dtype=self.dtype, name=f"norm{i}")(h, train)
            h = nn.relu(h)
            h = conv3x3(self.growth_rate, dtype=self.dtype, name=f"conv{i}")(h)
            features.append(h)
        return jnp.concatenate(features, axis=-1)


class DenseConvBlock(nn.Module):
    """DenseBlock + 1x1 transition conv -> BN -> ReLU (unet_dualdense.py:36-47)."""

    features: int
    growth_rate: int = 32
    num_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = DenseBlock(self.growth_rate, self.num_layers, dtype=self.dtype, name="dense")(
            x, train
        )
        x = conv1x1(self.features, dtype=self.dtype, name="trans_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="trans_bn")(x, train)
        return nn.relu(x)


class UpDense(nn.Module):
    """Dense decoder stage (unet_dualdense.py:50-61)."""

    features: int
    growth_rate: int = 32
    num_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = upsample2x(x, align_corners=False)
        if x.shape[-3:-1] != skip.shape[-3:-1]:
            from unet_embroidery_seg_tpu.ops.resize import resize_bilinear

            x = resize_bilinear(x, skip.shape[-3:-1], align_corners=False)
        x = jnp.concatenate([skip, x], axis=-1)
        return DenseConvBlock(
            self.features, self.growth_rate, self.num_layers, dtype=self.dtype, name="conv"
        )(x, train)
