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


def test_ssim_bounded_on_adversarial_inputs():
    """Round-2 regression: the E[x^2]-mu^2 variance form cancelled
    catastrophically on piecewise-flat images and produced SSIM of -2.06
    (outside the mathematical range [-1, 1]). The cancellation-safe form
    must stay in range on every adversarial input."""
    rng = np.random.RandomState(1)
    cases = [
        # piecewise-flat, large DC offset (the synthetic-protocol shape)
        np.full((1, 48, 48, 3), 0.937, np.float32),
        # flat + tiny noise: near-zero window variance
        (0.81 + rng.randn(1, 48, 48, 3) * 1e-4).astype(np.float32),
        # hard step edges
        np.kron(rng.rand(1, 6, 6, 3) > 0.5, np.ones((1, 8, 8, 1)))
        .astype(np.float32) * 2 - 1,
        # out-of-range values (activation-free parity head)
        (rng.randn(1, 48, 48, 3) * 3).astype(np.float32),
    ]
    for a in cases:
        for b in cases:
            s = float(ssim(jnp.asarray(a), jnp.asarray(b)))
            assert -1.0 <= s <= 1.0, (s, a.mean(), b.mean())
    for a in cases:
        s_aa = float(ssim(jnp.asarray(a), jnp.asarray(a)))
        assert s_aa > 0.999, s_aa


def test_metrics_clip_out_of_range_inputs():
    """PSNR/SSIM score on range-clipped images: a prediction at +7 vs a
    GT at +1 is a perfect match after clipping (the head is unbounded by
    reference parity; the metric range is not)."""
    gt = jnp.ones((1, 16, 16, 3))
    pred = jnp.full((1, 16, 16, 3), 7.0)
    assert float(psnr(pred, gt)) > 100.0
    assert float(ssim(pred, gt)) > 0.999
    # and clip=False preserves the raw-difference behaviour
    assert float(psnr(pred, gt, clip=False)) < 10.0


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
