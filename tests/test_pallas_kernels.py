"""Pallas kernel correctness (interpreter mode on CPU) against the jnp
reference implementations."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.losses.pixel import symmetry_loss, total_variation
from tpgan_tpu.models.local_fuser import fuse_parts
from tpgan_tpu.ops.pallas_kernels import (
    _sym_tv_sums_raw,
    fuse_parts_pallas,
    fuse_parts_pallas_interpret,
    symmetry_tv_losses,
)


def _parts(seed=0, c=5, b=2):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, 40, 40, c).astype(np.float32)),
        jnp.asarray(rng.randn(b, 40, 40, c).astype(np.float32)),
        jnp.asarray(rng.randn(b, 32, 40, c).astype(np.float32)),
        jnp.asarray(rng.randn(b, 32, 48, c).astype(np.float32)),
    )


def test_fuse_kernel_matches_jnp_interpret():
    parts = _parts()
    want = fuse_parts(*parts)
    got = fuse_parts_pallas_interpret(*parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fuse_pallas_dispatch_and_grad():
    """On CPU the custom-vjp wrapper falls back to jnp; its backward must
    match jax.grad of the jnp formulation."""
    parts = _parts(seed=1, c=3, b=1)

    def loss_ref(*ps):
        return jnp.sum(fuse_parts(*ps) ** 2)

    def loss_ker(*ps):
        return jnp.sum(fuse_parts_pallas(*ps) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*parts)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(*parts)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_sym_tv_kernel_matches_losses_interpret():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 16, 16, 4).astype(np.float32))
    sums = _sym_tv_sums_raw(x, interpret=True)
    b, h, w, c = x.shape
    sym = sums[0, 0] / (b * h * w * c)
    tv = sums[0, 1] / (b * (h - 1) * w * c) + sums[0, 2] / (b * h * (w - 1) * c)
    np.testing.assert_allclose(float(sym), float(symmetry_loss(x)), rtol=1e-5)
    np.testing.assert_allclose(float(tv), float(total_variation(x)), rtol=1e-5)


def test_symmetry_tv_losses_wrapper_cpu_path():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    sym, tv = symmetry_tv_losses(x)
    np.testing.assert_allclose(float(sym), float(symmetry_loss(x)), rtol=1e-5)
    np.testing.assert_allclose(float(tv), float(total_variation(x)), rtol=1e-5)


def test_conv3x3_epilogue_kernel_matches_xla():
    """The conv+bias+LeakyReLU Pallas prototype (interpret mode) vs the
    XLA formulation it races on the chip."""
    from tpgan_tpu.ops.pallas_kernels import (
        conv3x3_bias_lrelu_pallas,
        conv3x3_bias_lrelu_xla,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    want = conv3x3_bias_lrelu_xla(x, w, b, 0.2)
    got = conv3x3_bias_lrelu_pallas(x, w, b, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
