from .base import (
    OUTPUT_FIELD,
    OUTPUT_TYPE_FIELD,
    VALID_MASK_FIELD,
    DatasetMode,
    MTLDataset,
    eval_crop_mask,
    kitti_benchmark_crop,
)
from .augmentation import AugmentationConfig, ColorJitterConfig
from .datasets import DATASET_REGISTRY, get_dataset
from .loader import MixedTaskLoader, collate_train_batch
from .sampler import MixedTaskSchedule

__all__ = [
    "AugmentationConfig",
    "ColorJitterConfig",
    "DATASET_REGISTRY",
    "DatasetMode",
    "MTLDataset",
    "MixedTaskLoader",
    "MixedTaskSchedule",
    "OUTPUT_FIELD",
    "OUTPUT_TYPE_FIELD",
    "VALID_MASK_FIELD",
    "collate_train_batch",
    "eval_crop_mask",
    "get_dataset",
    "kitti_benchmark_crop",
]
