"""resize_conv upsampling mode (ops.blocks.DeconvBlock.mode).

The opt-in checkerboard-artifact fix must be shape-identical to the
reference-parity transpose-conv mode at every Generator call site
(torch ConvTranspose2d output formula: (in-1)*s - 2p + k + op), and the
full Generator must build/jit with it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpgan_tpu.ops.blocks import DeconvBlock


# (kernel, stride, padding, output_padding, in_hw) — the deconv geometries
# the Generator actually uses (D_and_G_model.py:218-224 + local pathway)
GEOMETRIES = [
    (3, 2, 1, 1, 16),   # standard 2x upsample (local + global decoders)
    (3, 4, 0, 1, 8),    # deconv_32: stride-4 (D_and_G_model.py:220)
    (8, 1, 0, 0, 1),    # deconv_8: 8x8 from a 1x1 vector (:218)
    (5, 2, 2, 1, 8),    # k5 variant exercised by ConvBlock parity tests
]


@pytest.mark.parametrize("k,s,p,op,hw", GEOMETRIES)
def test_resize_conv_shape_matches_deconv(k, s, p, op, hw):
    x = jnp.asarray(np.random.RandomState(0).randn(2, hw, hw, 6), jnp.float32)
    outs = {}
    for mode in ("deconv", "resize_conv"):
        blk = DeconvBlock(6, 5, k, s, p, op, mode=mode)
        vars_ = blk.init(jax.random.PRNGKey(0), x)
        outs[mode] = blk.apply(vars_, x)
    assert outs["deconv"].shape == outs["resize_conv"].shape
    assert np.all(np.isfinite(np.asarray(outs["resize_conv"])))


def test_resize_conv_nearest_geometry():
    # With an identity-like 3x3 conv the upsample must be exact nearest
    # replication: constant inputs stay constant.
    x = jnp.full((1, 4, 4, 3), 2.5, jnp.float32)
    blk = DeconvBlock(3, 3, 3, 2, 1, 1, activation=None, mode="resize_conv")
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(vars_, x)
    assert y.shape == (1, 8, 8, 3)
    # constant input -> (interior of) output constant under any conv
    inner = np.asarray(y)[0, 2:-2, 2:-2, :]
    assert np.allclose(inner, inner[0, 0], atol=1e-5)


def test_generator_resize_conv_builds_and_runs():
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import create_gan_state, example_batch, make_synthesize_fn

    cfg = make_config(
        {"G": {"fm_multiplier": 0.125, "upsample_mode": "resize_conv"},
         "D": {"fm_multiplier": 0.125}}
    )
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    batch = example_batch(2)
    z = jnp.zeros((2, cfg.G.zdim), jnp.float32)
    out = jax.jit(make_synthesize_fn(cfg, gen))(state.g_params, batch, z)
    assert out.shape == (2, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # param tree swaps ConvTranspose2d submodules (named exactly
    # "deconv") for Conv2d submodules (named "conv"); outer block names
    # like "dec0_deconv" legitimately keep the reference naming
    flat = jax.tree_util.tree_leaves_with_path(state.g_params)
    comps = {
        getattr(k, "key", None)
        for path, _ in flat
        for k in path
    }
    assert "deconv" not in comps and "conv" in comps
