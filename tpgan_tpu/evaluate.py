"""Evaluation harness for the north-star quality metrics (BASELINE.md):
pixel parity (PSNR / SSIM) of frontalized outputs and Rank-1
identification accuracy on a Multi-PIE-style gallery/probe protocol.

All metrics are jit-friendly batched jnp; the Rank-1 protocol follows the
TP-GAN paper's setup: embed the *synthesized frontal* probe images and
the one-gallery-image-per-identity set, then nearest-neighbour (cosine)
classification.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def psnr(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0,
    aggregate: bool = True,
) -> jnp.ndarray:
    """Peak signal-to-noise ratio per batch element (averaged unless
    ``aggregate=False``). ``data_range`` defaults to 2 for [-1, 1]."""
    mse = jnp.mean(
        jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)), axis=(1, 2, 3)
    )
    v = 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))
    return jnp.mean(v) if aggregate else v


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0,
    aggregate: bool = True,
) -> jnp.ndarray:
    """Mean SSIM (Wang et al.) over an NHWC batch with the standard
    11x11 Gaussian window, matching scikit-image's defaults. With
    ``aggregate=False`` returns the per-image mean SSIM instead."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel()[:, :, None, None]  # HWIO depthwise per channel
    c = a.shape[-1]
    kern = jnp.tile(kern, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_a2
    sb = filt(b * b) - mu_b2
    sab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sa + sb + c2)
    )
    return jnp.mean(s) if aggregate else jnp.mean(s, axis=(1, 2, 3))


def rank1_accuracy(
    probe_embeddings: jnp.ndarray,   # (P, D)
    probe_labels: jnp.ndarray,       # (P,)
    gallery_embeddings: jnp.ndarray, # (G, D)
    gallery_labels: jnp.ndarray,     # (G,)
) -> jnp.ndarray:
    """Cosine nearest-neighbour Rank-1 identification accuracy."""
    p = probe_embeddings / jnp.linalg.norm(
        probe_embeddings, axis=-1, keepdims=True
    ).clip(1e-12)
    g = gallery_embeddings / jnp.linalg.norm(
        gallery_embeddings, axis=-1, keepdims=True
    ).clip(1e-12)
    sim = p @ g.T  # (P, G)
    nearest = jnp.argmax(sim, axis=-1)
    pred = gallery_labels[nearest]
    return jnp.mean((pred == probe_labels).astype(jnp.float32))


def rank1_correct(
    probe_embeddings: jnp.ndarray,
    probe_labels: jnp.ndarray,
    gallery_embeddings: jnp.ndarray,
    gallery_labels: jnp.ndarray,
) -> jnp.ndarray:
    """Per-probe Rank-1 hit mask (bool (P,)) — for grouped breakdowns
    (e.g. accuracy vs yaw in the Multi-PIE protocol tables)."""
    p = probe_embeddings / jnp.linalg.norm(
        probe_embeddings, axis=-1, keepdims=True
    ).clip(1e-12)
    g = gallery_embeddings / jnp.linalg.norm(
        gallery_embeddings, axis=-1, keepdims=True
    ).clip(1e-12)
    nearest = jnp.argmax(p @ g.T, axis=-1)
    return gallery_labels[nearest] == probe_labels


def evaluate_frontalization(
    synthesize_fn: Callable,
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    probe_batch,
    probe_labels: jnp.ndarray,
    gallery_images: jnp.ndarray,
    gallery_labels: jnp.ndarray,
    frontal_gt: jnp.ndarray,
    z: jnp.ndarray,
    g_params,
) -> dict:
    """One-stop evaluation: synthesize frontal probes, report PSNR/SSIM
    vs ground truth and Rank-1 ID through the embedder."""
    fake = synthesize_fn(g_params, probe_batch, z)
    return {
        "psnr": psnr(fake, frontal_gt),
        "ssim": ssim(fake, frontal_gt),
        "rank1": rank1_accuracy(
            embed_fn(fake), probe_labels, embed_fn(gallery_images), gallery_labels
        ),
    }
