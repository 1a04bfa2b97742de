"""Qualitative sampling during GAN training: periodic image grids
(profile input / synthesized frontal / ground-truth frontal) written as
PNGs — the visual-evidence channel the reference lacks entirely (its
only training-time output is printed losses, Pretrain.py:289-291).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _to_u8(x: np.ndarray) -> np.ndarray:
    return ((np.clip(x, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)


def save_image_grid(
    rows, path: str, pad: int = 2
) -> None:
    """rows: list of (N, H, W, 3) float arrays in [-1, 1]; writes a grid
    PNG with one input per column, one array per row."""
    from PIL import Image

    u8_rows = []
    for arr in rows:
        arr = np.asarray(arr)
        n, h, w, c = arr.shape
        canvas = np.zeros((h + pad, n * (w + pad) - pad, c), np.uint8)
        for i in range(n):
            canvas[:h, i * (w + pad) : i * (w + pad) + w] = _to_u8(arr[i])
        u8_rows.append(canvas)
    grid = np.concatenate(u8_rows, axis=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def make_sample_fn(
    cfg,
    gen,
    dataset,
    out_dir: str,
    num_samples: int = 8,
    seed: int = 0,
):
    """Build a ``sample_fn(step, state)`` for ``run_gan_training``:
    synthesizes a fixed probe batch and writes
    ``<out_dir>/samples_<step>.png`` with rows [profile, fake, frontal]."""
    from tpgan_tpu.train.gan_trainer import make_synthesize_fn

    n = min(num_samples, len(dataset))
    items = [dataset[i] for i in range(n)]
    batch: Dict[str, np.ndarray] = {
        k: np.stack([it[k] for it in items]) for k in items[0]
    }
    # raw-uint8 datasets (PackedDataset to_float=False): decode on host
    # once — this is a tiny fixed probe batch
    batch = {
        k: ((2.0 * v.astype(np.float32) - 255.0) / 255.0
            if v.dtype == np.uint8 else v)
        for k, v in batch.items()
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    z = jax.random.normal(jax.random.PRNGKey(seed), (n, cfg.G.zdim))
    synthesize = jax.jit(make_synthesize_fn(cfg, gen))

    def sample_fn(step: int, state) -> None:
        fake = np.asarray(synthesize(state.g_params, jbatch, z))
        save_image_grid(
            [batch["img"], fake, batch["img_frontal"]],
            os.path.join(out_dir, f"samples_{step:06d}.png"),
        )

    return sample_fn
