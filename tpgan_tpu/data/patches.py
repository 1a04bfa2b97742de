"""Landmark-centred patch cropping — the reference's ``process``
geometry (reference: DataAndDataset.py:10-56):

* mouth centre = mean of the two mouth-corner landmarks (:42-43),
* per part, with (x, y) = floor(landmark):
  crop box = [x - w//2 + 1, x + w//2 + 1) x [y - h//2 + 1, y + h//2 + 1)
  (:46-54) — i.e. a (w, h) window whose *centre pixel* sits one past the
  floored landmark, zero-padded where it leaves the image (PIL crop
  semantics).

Patch sizes (W x H): eyes 40x40, nose 40x32, mouth 48x32 (:35-40).

Two implementations:
* :func:`crop_patches` — host-side numpy for dataset preparation.
* :func:`crop_patches_batch` — jit-compatible ``lax.dynamic_slice`` on a
  zero-padded image so test-time preprocessing (TestDataset,
  DataAndDataset.py:238-256) can run on-device with static shapes.
"""

from __future__ import annotations

from math import floor
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# (width, height) per part, reference order
PATCH_SIZES: Dict[str, Tuple[int, int]] = {
    "left_eye": (40, 40),
    "right_eye": (40, 40),
    "nose": (40, 32),
    "mouth": (48, 32),
}

_MAX_PAD = 64  # >= max patch dimension; padding margin for OOB crops


def mouth_center(landmarks5: np.ndarray) -> np.ndarray:
    """5-point landmarks -> 4 centres (left eye, right eye, nose, mouth):
    the mouth is the midpoint of the two corner landmarks."""
    lm = np.asarray(landmarks5, np.float32)
    out = lm[:4].copy()
    out[3] = (lm[3] + lm[4]) / 2.0
    return out


def crop_patches(image: np.ndarray, landmarks5: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side crop. ``image`` is HWC float; ``landmarks5`` is (5, 2)
    (x, y). Returns part name -> (h, w, C) array, zero-padded at borders."""
    centers = mouth_center(landmarks5)
    h_img, w_img = image.shape[:2]
    out = {}
    for i, (name, (w, h)) in enumerate(PATCH_SIZES.items()):
        x = floor(centers[i, 0])
        y = floor(centers[i, 1])
        left = x - w // 2 + 1
        top = y - h // 2 + 1
        patch = np.zeros((h, w) + image.shape[2:], image.dtype)
        src_l, src_t = max(left, 0), max(top, 0)
        src_r, src_b = min(left + w, w_img), min(top + h, h_img)
        if src_r > src_l and src_b > src_t:
            patch[src_t - top : src_b - top, src_l - left : src_r - left] = image[
                src_t:src_b, src_l:src_r
            ]
        out[name] = patch
    return out


def _crop_one(padded: jnp.ndarray, center_xy: jnp.ndarray, w: int, h: int):
    """dynamic_slice crop from a pre-padded image; offsets include the
    _MAX_PAD margin so out-of-bounds crops read zeros."""
    x = jnp.floor(center_xy[0]).astype(jnp.int32)
    y = jnp.floor(center_xy[1]).astype(jnp.int32)
    left = x - w // 2 + 1 + _MAX_PAD
    top = y - h // 2 + 1 + _MAX_PAD
    return lax.dynamic_slice(
        padded, (top, left, 0), (h, w, padded.shape[-1])
    )


def crop_patches_batch(
    images: jnp.ndarray, landmarks5: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Batched on-device crop: images (B, H, W, C), landmarks (B, 5, 2).
    Returns dict of (B, h, w, C) patches. Fully static shapes — jit/vmap
    friendly; the gather is 4 dynamic-slices per image."""

    def one(img, lm):
        centers = jnp.concatenate(
            [lm[:3], ((lm[3] + lm[4]) / 2.0)[None]], axis=0
        )
        padded = jnp.pad(
            img, ((_MAX_PAD, _MAX_PAD), (_MAX_PAD, _MAX_PAD), (0, 0))
        )
        return {
            name: _crop_one(padded, centers[i], w, h)
            for i, (name, (w, h)) in enumerate(PATCH_SIZES.items())
        }

    return jax.vmap(one)(images, landmarks5)
