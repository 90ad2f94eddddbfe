from unet_embroidery_seg_tpu.ops import losses, metrics, resize, schedules

__all__ = ["losses", "metrics", "resize", "schedules"]
