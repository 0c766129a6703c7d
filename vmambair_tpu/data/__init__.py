"""Data layer: registry-built datasets + loader factory.

Rebuilds `build_dataset`/`build_dataloader`
(`/root/reference/Deraining/basicsr/data/__init__.py:29-120`)."""

from __future__ import annotations

import logging

from ..utils.registry import DATASET_REGISTRY, build_from_cfg
from .loader import (DataLoader, DevicePrefetcher, EnlargedSampler,
                     InfinitePrefetcher)
from .paired_dataset import PairedImageDataset, SingleImageDataset
from .realesrgan_dataset import RealESRGANDataset, RealESRGANPairedDataset
from .task_datasets import (
    DeblurPairedDataset,
    DualPixelDefocusDataset,
    GaussianDenoisingDataset,
)
from .video_datasets import (
    FFHQDataset,
    REDSDataset,
    VideoTestDataset,
    Vimeo90KDataset,
)

logger = logging.getLogger("vmambair_tpu")


def build_dataset(dataset_opt: dict):
    dataset = build_from_cfg(
        {"type": dataset_opt["type"], "opt": dict(dataset_opt)},
        DATASET_REGISTRY,
    )
    logger.info(
        "Dataset [%s] - %s is built.",
        dataset.__class__.__name__,
        dataset_opt.get("name"),
    )
    return dataset


def build_dataloader(dataset, dataset_opt: dict, num_replicas: int = 1,
                     rank: int = 0, seed: int = 0, sampler=None):
    """Phase-aware loader factory (`data/__init__.py:29-88`)."""
    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        if sampler is None:
            # pad the virtual epoch to a multiple of the GLOBAL batch
            # (the reference pads to world_size, `data_sampler.py:31-33`;
            # padding to batch_size_per_gpu*num_gpu additionally guarantees
            # tiny datasets survive drop_last with at least one batch)
            sampler = EnlargedSampler(
                len(dataset), num_replicas, rank,
                dataset_opt.get("dataset_enlarge_ratio", 1),
                seed=seed,
                round_multiple=int(dataset_opt.get("batch_size_per_gpu", 1))
                * max(1, int(dataset_opt.get("num_gpu", 1))),
            )
        loader = DataLoader(
            dataset,
            batch_size=int(dataset_opt.get("batch_size_per_gpu", 1))
            * max(1, int(dataset_opt.get("num_gpu", 1))),
            sampler=sampler,
            num_workers=int(dataset_opt.get("num_worker_per_gpu", 4)),
            drop_last=True,
            seed=seed,
        )
    else:
        loader = DataLoader(
            dataset, batch_size=1, shuffle=False, num_workers=1,
            drop_last=False,
        )
    loader.name = dataset_opt.get("name", phase)
    return loader, sampler


__all__ = [
    "build_dataset",
    "build_dataloader",
    "DataLoader",
    "EnlargedSampler",
    "InfinitePrefetcher",
    "DevicePrefetcher",
    "PairedImageDataset",
    "SingleImageDataset",
    "RealESRGANDataset",
    "RealESRGANPairedDataset",
    "DATASET_REGISTRY",
]
