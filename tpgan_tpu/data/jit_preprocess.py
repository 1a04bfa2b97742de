"""Jit-compiled synthesis preprocessing — the reference's host-side
PIL/numpy TestDataset path (DataAndDataset.py:230-256, SURVEY.md §3.4)
re-expressed as one XLA program over fixed-shape batches:

    raw images (B, H, W, 3) + 68-pt landmarks (B, 68, 2)
      -> 68->5 landmark reduction (UtilityMethods.py:147-164)
      -> landmark rescale to the 128x128 frame (:244-246)
      -> Lanczos-3 resize to 128, then 64, then 32 (:247,250-251 —
         PIL.Image.LANCZOS is a Lanczos-3 filter; jax.image 'lanczos3'
         matches the kernel)
      -> landmark-centred patch crops via static dynamic-slices (:248)
      -> [-1, 1] normalisation (:253-255)

Everything runs on-device under a single jit; the host only supplies the
raw uint8 batch. This is the "preprocessing as a jit-compiled XLA
pipeline feeding HBM-resident batches" capability from BASELINE.md.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpgan_tpu.data.patches import crop_patches_batch
from tpgan_tpu.utils.misc import FIVE_PTS_IDX


def five_landmarks_from_68_jax(lm68: jnp.ndarray) -> jnp.ndarray:
    """Batched 68->5 reduction (B, 68+, 2) -> (B, 5, 2); mirrors
    utils.misc.five_landmarks_from_68 (incl. the 68-row fallback)."""
    n = lm68.shape[1]
    outs = []
    for lo, hi in FIVE_PTS_IDX:
        if lo >= n:
            lo = hi = 54
        outs.append(jnp.mean(lm68[:, lo : hi + 1, :], axis=1))
    return jnp.stack(outs, axis=1)


def preprocess_for_synthesis(
    images: jnp.ndarray,  # (B, H, W, 3) uint8 or float in [0, 1]
    landmarks68: jnp.ndarray,  # (B, 68, 2) pixel coords in the source frame
) -> Dict[str, jnp.ndarray]:
    """Full synthesis-input pipeline; jit/vmap/pmap friendly (static
    shapes throughout). Returns the TestDataset tensor contract:
    img/img64/img32 + the four patches, all in [-1, 1]."""
    lm5 = five_landmarks_from_68_jax(landmarks68.astype(jnp.float32))
    return preprocess_for_synthesis_lm5(images, lm5)


def preprocess_for_synthesis_lm5(
    images: jnp.ndarray,  # (B, H, W, 3) uint8 or float in [0, 1]
    lm5: jnp.ndarray,  # (B, 5, 2) source-frame pixel (x, y)
) -> Dict[str, jnp.ndarray]:
    """Same pipeline entered with 5-point landmarks directly (the form
    the landmark DETECTOR emits — the full-stack frontalize path,
    tpgan_tpu.frontalize — or any pre-reduced annotation)."""
    b, h, w, _ = images.shape
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0

    scale = jnp.asarray([128.0 / w, 128.0 / h], jnp.float32)
    lm5 = lm5.astype(jnp.float32) * scale[None, None, :]

    # clip after each resize: Lanczos ringing overshoots [0, 1], which
    # PIL's uint8 output implicitly clamps (parity with the host path)
    img128 = jnp.clip(
        jax.image.resize(x, (b, 128, 128, 3), method="lanczos3"), 0.0, 1.0
    )
    img64 = jnp.clip(
        jax.image.resize(img128, (b, 64, 64, 3), method="lanczos3"), 0.0, 1.0
    )
    img32 = jnp.clip(
        jax.image.resize(img64, (b, 32, 32, 3), method="lanczos3"), 0.0, 1.0
    )

    batch = {
        name: patch * 2.0 - 1.0
        for name, patch in crop_patches_batch(img128, lm5).items()
    }
    batch["img"] = img128 * 2.0 - 1.0
    batch["img64"] = img64 * 2.0 - 1.0
    batch["img32"] = img32 * 2.0 - 1.0
    return batch


def make_synthesis_pipeline(generator_apply):
    """Fuse preprocessing + generator forward into one jitted program:
    (params, raw uint8 images, landmarks68, z) -> frontalized images.
    The production serving path: raw bytes in HBM, one XLA dispatch out."""

    @jax.jit
    def pipeline(g_params, images, landmarks68, z):
        batch = preprocess_for_synthesis(images, landmarks68)
        return generator_apply(g_params, batch, z)

    return pipeline
