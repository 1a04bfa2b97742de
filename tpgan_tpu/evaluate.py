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
    aggregate: bool = True, clip: bool = True,
) -> jnp.ndarray:
    """Peak signal-to-noise ratio per batch element (averaged unless
    ``aggregate=False``). ``data_range`` defaults to 2 for [-1, 1].
    ``clip=True`` clamps both inputs to the data range first — the
    activation-free parity head can emit values outside [-1, 1] and a
    fixed-peak metric is only defined on the bounded range (same
    rationale as in :func:`ssim`)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if clip:
        half = data_range / 2.0
        a = jnp.clip(a, -half, half)
        b = jnp.clip(b, -half, half)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    v = 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))
    return jnp.mean(v) if aggregate else v


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0,
    aggregate: bool = True, clip: bool = True,
) -> jnp.ndarray:
    """Mean SSIM (Wang et al.) over an NHWC batch with the standard
    11x11 Gaussian window, matching scikit-image's defaults. With
    ``aggregate=False`` returns the per-image mean SSIM instead.

    Numerics: variances are computed as ``E[(x - mu)^2]`` (the filtered
    centred square), NOT ``E[x^2] - mu^2`` — the latter cancels
    catastrophically on near-constant windows and produced negative
    variances, i.e. SSIM values outside [-1, 1] (the round-2 -2.06
    artifact). ``clip=True`` additionally clamps both inputs to the
    metric's data range first — the generator head is activation-free for
    reference parity (models/global_pathway.py head,
    D_and_G_model.py:279), so raw outputs can exceed [-1, 1]; scoring a
    bounded-range metric on unbounded values is undefined. PSNR/SSIM are
    therefore always scored on range-clipped images (the standard
    protocol: quantize/clip before metric)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if clip:
        half = data_range / 2.0
        a = jnp.clip(a, -half, half)
        b = jnp.clip(b, -half, half)
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
    # cancellation-safe second moments: centre on the per-image mean
    # first (so flat regions contribute ~0 instead of mu^2-sized terms),
    # then clamp the residual roundoff — variance is >= 0 and covariance
    # is Cauchy-Schwarz-bounded by construction
    ma = jnp.mean(a, axis=(1, 2), keepdims=True)
    mb = jnp.mean(b, axis=(1, 2), keepdims=True)
    ac, bc = a - ma, b - mb
    mu_ac, mu_bc = filt(ac), filt(bc)
    sa = jnp.maximum(filt(ac * ac) - mu_ac * mu_ac, 0.0)
    sb = jnp.maximum(filt(bc * bc) - mu_bc * mu_bc, 0.0)
    sab = filt(ac * bc) - mu_ac * mu_bc
    # covariance is bounded by the variances (Cauchy-Schwarz); enforcing
    # it keeps the structure term in [-1, 1] under roundoff
    bound = jnp.sqrt(sa * sb)
    sab = jnp.clip(sab, -bound, bound)
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (sa + sb + c2)
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
