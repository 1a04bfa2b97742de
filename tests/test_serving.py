"""Serving export: StableHLO round-trip and AOT compile."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.serving import (
    aot_compile_synthesis,
    export_synthesis,
    load_synthesis,
)
from tpgan_tpu.train.gan_trainer import create_gan_state

CFG = make_config(
    {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
     "D": {"fm_multiplier": 0.25}, "compute_dtype": "float32"}
)


def _inputs(b=2):
    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.randn(b, 128, 128, 3).astype(np.float32)),
        "left_eye": jnp.asarray(rng.randn(b, 40, 40, 3).astype(np.float32)),
        "right_eye": jnp.asarray(rng.randn(b, 40, 40, 3).astype(np.float32)),
        "nose": jnp.asarray(rng.randn(b, 32, 40, 3).astype(np.float32)),
        "mouth": jnp.asarray(rng.randn(b, 32, 48, 3).astype(np.float32)),
    }
    return batch, jnp.zeros((b, 64), jnp.float32)


def test_export_roundtrip(tmp_path):
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "synthesis.stablehlo")
    export_synthesis(CFG, gen, state.g_params, path, batch=2)

    fn = load_synthesis(path)
    batch, z = _inputs(2)
    out = fn(batch, z)
    assert out.shape == (2, 128, 128, 3)

    # must match the live function exactly
    from tpgan_tpu.train.gan_trainer import make_synthesize_fn

    live = jax.jit(make_synthesize_fn(CFG, gen))(state.g_params, batch, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), rtol=1e-5)


def test_aot_compile(tmp_path):
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(0))
    compiled = aot_compile_synthesis(CFG, gen, state.g_params, batch=2)
    batch, z = _inputs(2)
    out = compiled(state.g_params, batch, z)
    assert out.shape == (2, 128, 128, 3)


def test_export_int8_roundtrip(tmp_path):
    """Int8 PTQ graph exports to StableHLO and round-trips: the loaded
    artifact reproduces the live int8 program exactly."""
    from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn

    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(0))
    batch, z = _inputs(2)
    scales = calibrate_synthesis(
        CFG, gen, state.g_params, [jax.device_get(batch)]
    )
    path = str(tmp_path / "synthesis_int8.stablehlo")
    export_synthesis(CFG, gen, state.g_params, path, batch=2,
                     quant_scales=scales)
    fn = load_synthesis(path)
    out = fn(batch, z)
    live = jax.jit(make_int8_synthesize_fn(CFG, gen, scales))(
        state.g_params, batch, z
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), rtol=1e-5)


def test_export_consumed_out_of_process(tmp_path):
    """The "serving binary without Python tracing" claim, proven: a
    FRESH interpreter that never imports tpgan_tpu deserializes the
    StableHLO artifact (fp32 and int8 variants) and runs it on raw
    numpy inputs — nothing from the framework is needed at serving
    time, only jax's runtime."""
    import os
    import subprocess
    import sys

    from tpgan_tpu.ops.quant import calibrate_synthesis

    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(0))
    batch, z = _inputs(2)
    paths = {"fp32": str(tmp_path / "synthesis.stablehlo")}
    export_synthesis(CFG, gen, state.g_params, paths["fp32"], batch=2)
    scales = calibrate_synthesis(
        CFG, gen, state.g_params, [jax.device_get(batch)]
    )
    paths["int8"] = str(tmp_path / "synthesis_int8.stablehlo")
    export_synthesis(CFG, gen, state.g_params, paths["int8"], batch=2,
                     quant_scales=scales)

    for k, v in batch.items():
        np.save(tmp_path / f"{k}.npy", np.asarray(v))
    np.save(tmp_path / "zz.npy", np.asarray(z))
    consumer = tmp_path / "consumer.py"
    consumer.write_text(
        "import sys\n"
        "import numpy as np\n"
        # this host's sitecustomize force-registers the tunneled-TPU
        # plugin via jax.config, which overrides JAX_PLATFORMS=cpu; the
        # artifact was exported for cpu, so mirror the env var back
        # (same workaround as __graft_entry__.py)
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax import export as jexport\n"
        "path, data_dir, out_path = sys.argv[1:4]\n"
        "keys = ('img', 'left_eye', 'right_eye', 'nose', 'mouth')\n"
        "batch = {k: np.load(f'{data_dir}/{k}.npy') for k in keys}\n"
        "z = np.load(f'{data_dir}/zz.npy')\n"
        "fn = jexport.deserialize(open(path, 'rb').read()).call\n"
        "out = np.asarray(fn(batch, z))\n"
        "assert not any(m.split('.')[0] == 'tpgan_tpu'\n"
        "               for m in sys.modules), 'framework leaked in'\n"
        "np.save(out_path, out)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for variant, path in paths.items():
        out_path = tmp_path / f"out_{variant}.npy"
        subprocess.run(
            [sys.executable, str(consumer), path, str(tmp_path),
             str(out_path)],
            check=True, env=env, timeout=300,
        )
        got = np.load(out_path)
        assert got.shape == (2, 128, 128, 3) and np.isfinite(got).all()
        # parity vs the in-process load of the same artifact
        want = load_synthesis(path)(batch, z)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5,
                                   atol=1e-5)


def test_export_frontalize_roundtrip(tmp_path):
    """Full-stack artifact: raw uint8 -> detector -> crops -> G, params
    baked — deserialized output must match the live fused program."""
    from tpgan_tpu.frontalize import make_frontalize_fn
    from tpgan_tpu.serving import export_frontalize
    from tpgan_tpu.train.pretrain import create_pretrain_state

    det_state, detector, _tx = create_pretrain_state(
        CFG, jax.random.PRNGKey(0)
    )
    det_vars = {"params": det_state.params,
                "batch_stats": det_state.batch_stats}
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(1))

    path = str(tmp_path / "frontalize.stablehlo")
    export_frontalize(
        CFG, detector, det_vars, gen, state.g_params, path,
        batch=2, input_hw=(96, 80), detector_size=128,
    )

    fn = load_synthesis(path)  # generic StableHLO loader
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(2, 96, 80, 3) * 255).astype(np.uint8))
    z = jnp.zeros((2, CFG.G.zdim), jnp.float32)
    fake, lm5, scores = fn(images, z)
    assert fake.shape == (2, 128, 128, 3)
    assert lm5.shape == (2, 5, 2)
    assert scores.shape == (2, 4)

    live = jax.jit(make_frontalize_fn(CFG, detector, gen, detector_size=128))
    fake_l, lm5_l, scores_l = live(state.g_params, det_vars, images, z)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(fake_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm5), np.asarray(lm5_l),
                               rtol=1e-5, atol=1e-4)


def test_export_frontalize_vote_roundtrip(tmp_path):
    """Full-stack artifact with the round-5 serving decode hardening
    baked in (TTA + nose-only refine + shape-prior 3-way vote): the
    graph serialises (pure jnp ops — two extra detector forwards and
    the vote selects) and the deserialized outputs match the live
    program."""
    from tpgan_tpu.frontalize import make_frontalize_fn
    from tpgan_tpu.serving import export_frontalize
    from tpgan_tpu.train.pretrain import create_pretrain_state

    det_state, detector, _tx = create_pretrain_state(
        CFG, jax.random.PRNGKey(0)
    )
    det_vars = {"params": det_state.params,
                "batch_stats": det_state.batch_stats}
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    prior = (rng.rand(7, 2) * 0.3).astype(np.float32)

    path = str(tmp_path / "frontalize_vote.stablehlo")
    export_frontalize(
        CFG, detector, det_vars, gen, state.g_params, path,
        batch=2, input_hw=(96, 80), detector_size=128,
        tta=True, refine=True, nose_prior=prior,
    )

    fn = load_synthesis(path)
    images = jnp.asarray((rng.rand(2, 96, 80, 3) * 255).astype(np.uint8))
    z = jnp.zeros((2, CFG.G.zdim), jnp.float32)
    fake, lm5, scores = fn(images, z)
    assert fake.shape == (2, 128, 128, 3)

    live = jax.jit(make_frontalize_fn(
        CFG, detector, gen, detector_size=128,
        tta=True, refine=True, nose_prior=prior,
    ))
    fake_l, lm5_l, _ = live(state.g_params, det_vars, images, z)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(fake_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm5), np.asarray(lm5_l),
                               rtol=1e-5, atol=1e-4)


def test_export_frontalize_int8_roundtrip(tmp_path):
    """Full-stack artifact with an int8 PTQ generator stage: loaded
    output must match the live int8 frontalize program."""
    from tpgan_tpu.frontalize import make_frontalize_fn
    from tpgan_tpu.ops.quant import calibrate_synthesis
    from tpgan_tpu.serving import export_frontalize
    from tpgan_tpu.train.pretrain import create_pretrain_state

    det_state, detector, _tx = create_pretrain_state(
        CFG, jax.random.PRNGKey(0)
    )
    det_vars = {"params": det_state.params,
                "batch_stats": det_state.batch_stats}
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(1))
    batch, _z = _inputs(2)
    scales = calibrate_synthesis(
        CFG, gen, state.g_params, [jax.device_get(batch)]
    )

    path = str(tmp_path / "frontalize_int8.stablehlo")
    export_frontalize(
        CFG, detector, det_vars, gen, state.g_params, path,
        batch=2, input_hw=(96, 96), detector_size=128,
        quant_scales=scales, rescale_dtype=jnp.bfloat16,
    )

    fn = load_synthesis(path)
    rng = np.random.RandomState(1)
    images = jnp.asarray((rng.rand(2, 96, 96, 3) * 255).astype(np.uint8))
    z = jnp.zeros((2, CFG.G.zdim), jnp.float32)
    fake, lm5, scores = fn(images, z)
    assert fake.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(fake, np.float32)).all()

    live = jax.jit(make_frontalize_fn(
        CFG, detector, gen, detector_size=128,
        quant_scales=scales, quant_rescale_dtype=jnp.bfloat16,
    ))(state.g_params, det_vars, images, z)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(live[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm5), np.asarray(live[1]),
                               rtol=1e-5, atol=1e-4)


def test_export_weights_dtype_bf16(tmp_path):
    """--weights-dtype bfloat16: on a bf16-compute model the baked-bf16
    artifact reproduces the live program run on pre-cast params exactly
    (conv kernels are cast to bf16 at use either way), and the artifact
    shrinks to ~half."""
    import os

    from tpgan_tpu.serving import cast_float_leaves
    from tpgan_tpu.train.gan_trainer import make_synthesize_fn

    cfg = make_config(
        {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
         "D": {"fm_multiplier": 0.25}, "compute_dtype": "bfloat16"}
    )
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    batch, z = _inputs(2)

    p32 = str(tmp_path / "synthesis_f32w.stablehlo")
    p16 = str(tmp_path / "synthesis_bf16w.stablehlo")
    export_synthesis(cfg, gen, state.g_params, p32, batch=2)
    export_synthesis(cfg, gen, state.g_params, p16, batch=2,
                     weights_dtype=jnp.bfloat16)
    assert os.path.getsize(p16) < 0.65 * os.path.getsize(p32)

    out = load_synthesis(p16)(batch, z)
    cast = cast_float_leaves(state.g_params, jnp.bfloat16)
    live = jax.jit(make_synthesize_fn(cfg, gen))(cast, batch, z)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(live, np.float32)
    )
    # and the bf16-weight program stays close to the f32-weight one
    ref = np.asarray(load_synthesis(p32)(batch, z), np.float32)
    assert np.max(np.abs(ref - np.asarray(out, np.float32))) < 0.1
