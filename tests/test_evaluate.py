"""Evaluation metric tests: PSNR exactness, SSIM vs scikit-image-style
properties, Rank-1 protocol."""

import numpy as np

import jax.numpy as jnp

from tpgan_tpu.evaluate import psnr, rank1_accuracy, ssim


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.2)
    # mse = 0.04, range 2 => 10*log10(4/0.04) = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)
    assert float(psnr(a, a)) > 100.0


def test_ssim_identity_and_noise():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    assert float(ssim(a, a)) > 0.999
    noisy = a + jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)
    s = float(ssim(a, noisy))
    assert 0.0 < s < 0.8


def test_rank1_protocol():
    # 3 identities; probes embed near their gallery entries
    gallery = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    g_labels = jnp.asarray([10, 20, 30])
    probes = jnp.asarray(
        np.stack([
            [0.9, 0.1, 0.0, 0.0],   # -> id 10
            [0.0, 1.1, 0.1, 0.0],   # -> id 20
            [0.1, 0.0, 0.8, 0.0],   # -> id 30
            [1.0, 0.0, 0.1, 0.0],   # -> id 10 but labelled 30 (miss)
        ]).astype(np.float32)
    )
    p_labels = jnp.asarray([10, 20, 30, 30])
    acc = float(rank1_accuracy(probes, p_labels, gallery, g_labels))
    np.testing.assert_allclose(acc, 0.75)
