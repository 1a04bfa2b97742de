"""Data subsystem: patch-crop geometry, CelebA landmark pretraining data,
Multi-PIE-style GAN train/test data, and a double-buffered host->HBM
prefetch pipeline (replacing the reference's single-threaded PIL loader,
SURVEY.md §2.2 "async/overlapped data loading")."""

from tpgan_tpu.data.patches import crop_patches, crop_patches_batch
from tpgan_tpu.data.celeba import CelebALandmarkDataset, parse_celeba_landmarks
from tpgan_tpu.data.multipie import (
    TrainDataset,
    TestDataset,
    frontal_twin_path,
)
from tpgan_tpu.data.pipeline import batch_iterator, prefetch_to_device
from tpgan_tpu.data.synthetic import synthetic_gan_batch, synthetic_pretrain_batch

__all__ = [
    "crop_patches",
    "crop_patches_batch",
    "CelebALandmarkDataset",
    "parse_celeba_landmarks",
    "TrainDataset",
    "TestDataset",
    "frontal_twin_path",
    "batch_iterator",
    "prefetch_to_device",
    "synthetic_gan_batch",
    "synthetic_pretrain_batch",
]
