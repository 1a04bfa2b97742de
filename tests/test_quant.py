"""Int8 PTQ: per-channel weight quant + calibrated activation scales.

Numerical bounds at the single-conv level, calibration bookkeeping, and
the full generator int8 program (vs its float twin)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.ops import quant
from tpgan_tpu.ops.blocks import Conv2d, ConvTranspose2d


def test_quantize_weight_per_channel_bounds():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    w_q, scale = quant.quantize_weight_per_channel(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (16,)
    # dequantized error bounded by half a step per channel
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(scale) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(scale) + 1e-7).all()


def test_int8_conv_matches_float_within_quant_error():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    from jax import lax

    want = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = quant.int8_conv(
        x, w, jnp.max(jnp.abs(x)),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # int8 relative error on a single conv: ~1% of the dynamic range
    denom = float(jnp.max(jnp.abs(want)))
    rel = float(jnp.max(jnp.abs(got - want))) / denom
    assert rel < 0.02, rel


def test_conv2d_calibration_and_int8_trace():
    """Conv2d under calib mode records absmax; under int8 mode consumes
    it and produces a close output."""
    conv = Conv2d(8, 16, 3, padding=1, accum_f32=False)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(variables, x)

    with quant.quant_mode(quant.CALIB):
        _, mut = conv.apply(variables, x, mutable=["quant"])
    absmax = float(mut["quant"]["x_absmax"])
    assert absmax == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)

    # running maximum across calibration batches
    x2 = x * 2.0
    with quant.quant_mode(quant.CALIB):
        _, mut2 = conv.apply(
            {**variables, "quant": mut["quant"]}, x2, mutable=["quant"]
        )
    assert float(mut2["quant"]["x_absmax"]) == pytest.approx(2 * absmax, rel=1e-6)

    with quant.quant_mode(quant.INT8):
        got = conv.apply({**variables, "quant": mut["quant"]}, x)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 0.05, rel


def test_deconv_int8_trace():
    deconv = ConvTranspose2d(8, 8, 4, stride=2, padding=1, accum_f32=False)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    variables = deconv.init(jax.random.PRNGKey(0), x)
    want = deconv.apply(variables, x)
    with quant.quant_mode(quant.CALIB):
        _, mut = deconv.apply(variables, x, mutable=["quant"])
    with quant.quant_mode(quant.INT8):
        got = deconv.apply({**variables, "quant": mut["quant"]}, x)
    assert got.shape == want.shape == (2, 16, 16, 8)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 0.05, rel


def test_generator_int8_synthesis():
    """Full pipeline on the small generator: calibrate over 2 batches,
    jit the int8 program, compare against the float program."""
    from tpgan_tpu.data.synthetic import synthetic_gan_batch
    from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn
    from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn

    cfg = make_config(
        {
            "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
            "D": {"fm_multiplier": 0.25},
            "compute_dtype": "float32",
        }
    )
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))

    batches = [synthetic_gan_batch(2, seed=s) for s in range(2)]
    scales = calibrate_synthesis(cfg, gen, state.g_params, batches)
    # every conv/deconv in the generator observed a nonzero absmax
    leaves = jax.tree.leaves(scales)
    assert len(leaves) > 50
    assert all(float(v) > 0 for v in leaves)

    batch = {k: jnp.asarray(v) for k, v in synthetic_gan_batch(2, seed=9).items()}
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.G.zdim))
    f32 = jax.jit(make_synthesize_fn(cfg, gen))(state.g_params, batch, z)
    i8 = jax.jit(make_int8_synthesize_fn(cfg, gen, scales))(
        state.g_params, batch, z
    )
    assert i8.shape == f32.shape
    assert np.isfinite(np.asarray(i8)).all()
    # images live in [-1, 1]; random-init networks compound quant noise,
    # so bound loosely here — the trained-model PSNR bound is measured on
    # the chip and recorded in docs/BENCHMARKS.md
    mae = float(jnp.mean(jnp.abs(i8 - f32)))
    assert mae < 0.25, mae


def test_generator_int8_subpixel_matches_deconv():
    """The int8 PTQ program over the subpixel upsample algorithm (the
    measured int8 serving winner — artifacts/subpixel_probe_r4.json:
    1577.8 vs 1328.2 imgs/s/chip dilated) must agree with the int8
    program over the dilated algorithm on the SAME params: the float
    graphs are exactly equal (tests/test_blocks.py generator parity),
    so the only divergence budget is per-channel quantisation rounding
    of the phase-rearranged kernels."""
    from tpgan_tpu.data.synthetic import synthetic_gan_batch
    from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn
    from tpgan_tpu.train.gan_trainer import create_gan_state

    small = {
        "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
        "D": {"fm_multiplier": 0.25},
        "compute_dtype": "float32",
    }
    cfg_a = make_config({**small, "G": {**small["G"], "upsample_mode": "deconv"}})
    cfg_b = make_config({**small, "G": {**small["G"], "upsample_mode": "subpixel"}})
    state, gen_a, *_ = create_gan_state(cfg_a, jax.random.PRNGKey(0))
    _, gen_b, *_ = create_gan_state(cfg_b, jax.random.PRNGKey(0))

    batches = [synthetic_gan_batch(2, seed=s) for s in range(2)]
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_gan_batch(2, seed=9).items()}
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg_a.G.zdim))

    outs = []
    for cfg, gen in ((cfg_a, gen_a), (cfg_b, gen_b)):
        scales = calibrate_synthesis(cfg, gen, state.g_params, batches)
        outs.append(
            jax.jit(make_int8_synthesize_fn(cfg, gen, scales))(
                state.g_params, batch, z
            )
        )
    a, b = (np.asarray(o, np.float32) for o in outs)
    assert np.isfinite(b).all()
    mae = float(np.mean(np.abs(a - b)))
    # same int8 math modulo the per-phase-channel rounding granularity
    assert mae < 0.05, mae
