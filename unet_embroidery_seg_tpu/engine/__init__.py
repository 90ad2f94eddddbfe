from unet_embroidery_seg_tpu.engine import checkpoint, steps
from unet_embroidery_seg_tpu.engine.state import TrainState

__all__ = ["TrainState", "checkpoint", "steps"]
