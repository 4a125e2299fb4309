"""Data layer: multi-rater datasets, splits, jittable augmentations, loaders."""

from .dataset import MultiRaterDataset, load_splits
from .loader import BatchLoader
from .augment import TrainAugmentConfig, augment_batch, normalize_batch

__all__ = [
    "MultiRaterDataset",
    "load_splits",
    "BatchLoader",
    "TrainAugmentConfig",
    "augment_batch",
    "normalize_batch",
]
