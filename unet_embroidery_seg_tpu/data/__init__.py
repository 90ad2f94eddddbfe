from unet_embroidery_seg_tpu.data.dataset import Batch, DataLoader, SegmentationDataset, collate
from unet_embroidery_seg_tpu.data.sources import (
    CLASS_NAMES,
    CLASS_TO_IDX,
    HFParquetSource,
    SyntheticSource,
    class_index_from_label,
    open_source,
)

__all__ = [
    "Batch",
    "DataLoader",
    "SegmentationDataset",
    "collate",
    "CLASS_NAMES",
    "CLASS_TO_IDX",
    "HFParquetSource",
    "SyntheticSource",
    "class_index_from_label",
    "open_source",
]
