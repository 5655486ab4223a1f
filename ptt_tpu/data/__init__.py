"""Data layer: tracklet datasets (KITTI, nuScenes, synthetic), host-side preprocessing
(crop/resample/augment in numpy), and a prefetching loader that yields fixed-shape
device batches (replacing torch DataLoader workers; SURVEY.md L4)."""

from .dataset import TrackingDataset
from .kitti import KittiTrackingDataset
from .nuscenes import NuscenesTrackingDataset
from .synthetic import SyntheticTrackingDataset
from .loader import DataLoader, build_dataloader

ALL_DATASETS = {
    "KittiTrackingDataset": KittiTrackingDataset,
    "NuscenesTrackingDataset": NuscenesTrackingDataset,
    "SyntheticTrackingDataset": SyntheticTrackingDataset,
}

__all__ = [
    "TrackingDataset",
    "KittiTrackingDataset",
    "NuscenesTrackingDataset",
    "SyntheticTrackingDataset",
    "DataLoader",
    "build_dataloader",
    "ALL_DATASETS",
]
