"""Model registry + construction/initialization/flexible-restore.

Parity target: /root/reference/model/model_factory.py — the same five names,
the multitask special-case (num_seg_classes/num_cls_classes), and
``load_weights_flexible`` semantics (load only entries whose key path AND
shape match; report loaded/skipped counts).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.traverse_util import flatten_dict, unflatten_dict

from unet_embroidery_seg_tpu.models.unet_attention import AttentionUNet
from unet_embroidery_seg_tpu.models.unet_dualdense import DualDenseUNet
from unet_embroidery_seg_tpu.models.unet_multitask import MultiTaskUNet
from unet_embroidery_seg_tpu.models.unet_plain import UNetPlain
from unet_embroidery_seg_tpu.models.unet_resnet import UNetResNet50

SUPPORTED_MODELS = {
    "unet_plain": UNetPlain,
    "unet_resnet50": UNetResNet50,
    "attention_unet": AttentionUNet,
    "dualdense_unet": DualDenseUNet,
    "multitask_unet": MultiTaskUNet,
}


def build_model(
    model_name: str,
    num_classes: int,
    num_seg_classes: int = 1,
    num_cls_classes: int = 3,
    dtype: Any = None,
    diff_head: bool = False,
    decoder_width: float = 1.0,
) -> nn.Module:
    """Construct a model by registry name (model_factory.py:22-38).

    ``dtype`` is the compute dtype (pass jnp.bfloat16 for the AMP analogue);
    parameters always stay float32. ``diff_head=True`` (binary training fast
    path) makes the model return the binary logit difference (N, H, W)
    instead of 2-channel logits — same parameters, see blocks.ClassHead.
    ``decoder_width`` (unet_resnet50 only) is the opt-in MXU-utilization
    width multiplier — see unet_resnet.py's module docstring; 1.0 is the
    reference-parity architecture.
    """
    if model_name not in SUPPORTED_MODELS:
        raise ValueError(
            f"Unsupported model: {model_name}. Supported: {sorted(SUPPORTED_MODELS.keys())}"
        )
    if decoder_width != 1.0 and model_name != "unet_resnet50":
        raise ValueError(
            "decoder_width is a unet_resnet50 option (the C=64 decoder tail "
            f"is its utilization cap); got {decoder_width} for {model_name}"
        )
    if model_name == "multitask_unet":
        if diff_head:
            raise ValueError("diff_head applies to binary single-task models only")
        return MultiTaskUNet(
            num_seg_classes=num_seg_classes,
            num_cls_classes=num_cls_classes,
            dtype=dtype,
        )
    if model_name == "unet_resnet50":
        return UNetResNet50(
            num_classes=num_classes, dtype=dtype, diff_head=diff_head,
            decoder_width=decoder_width,
        )
    return SUPPORTED_MODELS[model_name](
        num_classes=num_classes, dtype=dtype, diff_head=diff_head
    )


def init_model(
    model: nn.Module, rng: jax.Array, input_shape: tuple[int, int], batch: int = 1
) -> dict:
    """Initialize variables ({'params', 'batch_stats'}) with a dummy batch.

    The reference's ``weights_init`` scheme is baked into the modules'
    initializers (blocks.py), so plain ``init`` reproduces it.
    """
    dummy = jnp.zeros((batch, input_shape[0], input_shape[1], 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy, train=False)
    return dict(variables)


def load_weights_flexible(variables: dict, pretrained: dict) -> tuple[dict, int, int]:
    """Merge pretrained entries whose key path and shape both match.

    Mirrors model_factory.py:41-64: everything else in ``variables`` is kept
    as-is, and (loaded, skipped) counts are returned for reporting. Operates
    over the flattened {'params', 'batch_stats'} trees, so partial restores
    across head-size changes (num_classes finetunes) work the same way.
    """
    flat_model = flatten_dict(variables)
    flat_pre = flatten_dict(pretrained)
    loaded, skipped = 0, 0
    out = dict(flat_model)
    for k, v in flat_pre.items():
        if k in flat_model and jnp.shape(flat_model[k]) == jnp.shape(v):
            out[k] = jnp.asarray(v, dtype=flat_model[k].dtype)
            loaded += 1
        else:
            skipped += 1
    return unflatten_dict(out), loaded, skipped
