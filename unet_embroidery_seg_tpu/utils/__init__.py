from unet_embroidery_seg_tpu.utils.exp_folder import (
    create_exp_folder,
    create_val_exp_folder,
)
from unet_embroidery_seg_tpu.utils.seeding import seed_everything

__all__ = ["create_exp_folder", "create_val_exp_folder", "seed_everything"]
