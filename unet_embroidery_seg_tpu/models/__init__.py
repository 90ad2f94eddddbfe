from unet_embroidery_seg_tpu.models.factory import (
    SUPPORTED_MODELS,
    build_model,
    init_model,
    load_weights_flexible,
)
from unet_embroidery_seg_tpu.models.resnet_backbone import ResNet50Backbone
from unet_embroidery_seg_tpu.models.unet_attention import AttentionUNet
from unet_embroidery_seg_tpu.models.unet_dualdense import DualDenseUNet
from unet_embroidery_seg_tpu.models.unet_multitask import MultiTaskUNet
from unet_embroidery_seg_tpu.models.unet_plain import UNetPlain
from unet_embroidery_seg_tpu.models.unet_resnet import UNetResNet50

__all__ = [
    "SUPPORTED_MODELS",
    "build_model",
    "init_model",
    "load_weights_flexible",
    "ResNet50Backbone",
    "AttentionUNet",
    "DualDenseUNet",
    "MultiTaskUNet",
    "UNetPlain",
    "UNetResNet50",
]
