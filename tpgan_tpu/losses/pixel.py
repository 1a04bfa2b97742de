"""Pixel-space reconstruction losses (reference: config.py:73-78,81 and
the reconstructed GAN step, SURVEY.md §3.3).

Documented decision: the reference GlobalPathway's 32/64-resolution
decoder heads are commented out (D_and_G_model.py:254,263,313-320) yet
config carries ``weight_32``/``weight_64`` (config.py:74-75) and
TrainDataset loads 32/64 frontal ground truth (DataAndDataset.py:207-211).
We honour the config by area-downsampling the 128x128 output to 64 and 32
for the multi-scale L1 terms — equivalent supervision without the dead
heads.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _downsample_area(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Area (average-pool) downsample by an integer factor — a single
    reshape+mean, which XLA fuses; no gather."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def multiscale_pixel_loss(
    fake128: jnp.ndarray,
    gt128: jnp.ndarray,
    gt64: jnp.ndarray,
    gt32: jnp.ndarray,
    weight_128: float = 1.0,
    weight_64: float = 1.0,
    weight_32: float = 1.5,
) -> jnp.ndarray:
    """Scale-weighted L1 against the three ground-truth resolutions
    (weights: config.py:73-75)."""
    fake64 = _downsample_area(fake128, 2)
    fake32 = _downsample_area(fake128, 4)
    return (
        weight_128 * l1(fake128, gt128)
        + weight_64 * l1(fake64, gt64)
        + weight_32 * l1(fake32, gt32)
    )


def local_pixel_loss(
    fused_fake: jnp.ndarray, fused_frontal_gt: jnp.ndarray
) -> jnp.ndarray:
    """L1 between the fused fake-patch mosaic and the fused frontal
    ground-truth-patch mosaic (weight: config.py:77)."""
    return l1(fused_fake, fused_frontal_gt)


def symmetry_loss(fake: jnp.ndarray) -> jnp.ndarray:
    """L1 between the output and its horizontal mirror — frontal faces
    are near-symmetric (weight: config.py:78). NHWC: flip width axis."""
    return l1(fake, jnp.flip(fake, axis=2))


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute forward differences along H and W
    (weight: config.py:81)."""
    x = x.astype(jnp.float32)
    dh = jnp.mean(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
    dw = jnp.mean(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return dh + dw
