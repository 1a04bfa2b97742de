"""End-to-end GAN train step (BASELINE config 3): fused D+G WGAN-GP
alternation runs, losses are finite, parameters change, and the step jits
with donated state."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.data.synthetic import synthetic_gan_batch
from tpgan_tpu.train.gan_trainer import (
    create_gan_state,
    example_batch,
    make_gan_train_step,
)

SMALL = {
    "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
    "D": {"fm_multiplier": 0.25},
    "compute_dtype": "float32",
}


def _rand_batch(rng, b=2):
    batch = example_batch(b)
    out = {}
    for k, v in batch.items():
        if v.dtype == jnp.int32:
            out[k] = jnp.asarray(rng.randint(0, 347, v.shape), jnp.int32)
        else:
            out[k] = jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.5)
    return out


def test_gan_train_step_runs_and_updates():
    cfg = make_config(SMALL)
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx), donate_argnums=0
    )

    rng = np.random.RandomState(0)
    batch = _rand_batch(rng)

    g_kernel_before = np.asarray(
        state.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    )
    d_kernel_before = np.asarray(state.d_params["conv0"]["conv"]["kernel"])

    state2, metrics = step(state, batch, jax.random.PRNGKey(1))

    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # both networks actually moved
    assert not np.allclose(
        np.asarray(state2.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]),
        g_kernel_before,
    )
    assert not np.allclose(
        np.asarray(state2.d_params["conv0"]["conv"]["kernel"]), d_kernel_before
    )
    # gradient penalty engaged
    assert float(metrics["d_gradient_penalty"]) > 0.0

    # second step reuses the compiled program
    batch2 = _rand_batch(np.random.RandomState(2))
    state3, m2 = step(state2, batch2, jax.random.PRNGKey(2))
    assert int(state3.step) == 2
    assert np.isfinite(float(m2["g_loss"]))


def test_identity_embed_hook():
    """The identity-preserving term flows through a provided embedder."""
    cfg = make_config(SMALL)
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))

    def fake_embed(x):  # stand-in embedder: global average pool
        return jnp.mean(x, axis=(1, 2))

    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx, identity_embed=fake_embed),
        donate_argnums=0,
    )
    batch = _rand_batch(np.random.RandomState(1))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["g_identity_preserving"]) > 0.0


def test_multi_step_scan():
    """K train steps in one dispatch via lax.scan — state advances K
    times and per-step metrics stack."""
    from tpgan_tpu.train.gan_trainer import make_multi_step

    cfg = make_config(SMALL)
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg, gen, disc, g_tx, d_tx)
    K = 2
    multi = jax.jit(make_multi_step(step, K), donate_argnums=0)

    rng = np.random.RandomState(3)
    single = _rand_batch(rng, b=2)
    super_batch = {k: jnp.stack([v, v]) for k, v in single.items()}
    state2, metrics = multi(state, super_batch, jax.random.PRNGKey(1))
    assert int(state2.step) == K
    assert metrics["g_loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["g_loss"])).all()


def test_gan_train_step_with_batchnorm():
    """use_batchnorm=True end to end: BN running stats thread through the
    alternation and advance (the reference's ctor-default configuration,
    D_and_G_model.py:351)."""
    cfg = make_config({
        "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16,
              "use_batchnorm": True},
        "D": {"fm_multiplier": 0.25, "use_batchnorm": True},
        "compute_dtype": "float32",
    })
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    assert state.g_batch_stats and state.d_batch_stats
    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx), donate_argnums=0
    )
    batch = _rand_batch(np.random.RandomState(5))
    g_mean_before = np.asarray(
        jax.tree.leaves(state.g_batch_stats)[0]
    ).copy()
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    g_mean_after = np.asarray(jax.tree.leaves(state2.g_batch_stats)[0])
    assert not np.allclose(g_mean_after, g_mean_before)
    d_leaves = jax.tree.leaves(state2.d_batch_stats)
    assert any(not np.allclose(np.asarray(x), 0.0) for x in d_leaves)


def test_synthesize_with_batchnorm_generator():
    from tpgan_tpu.train.gan_trainer import make_synthesize_fn

    cfg = make_config({
        "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16,
              "use_batchnorm": True},
        "D": {"fm_multiplier": 0.25, "use_batchnorm": True},
        "compute_dtype": "float32",
    })
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    synthesize = jax.jit(make_synthesize_fn(cfg, gen))
    batch = _rand_batch(np.random.RandomState(0), b=1)
    z = jnp.zeros((1, 64))
    out = synthesize(state.g_params, batch, z, state.g_batch_stats)
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_train_step_decodes_uint8_batches():
    """Production input path: uint8 batches (PackedDataset to_float=False)
    decode on device inside the jitted step, matching the float path."""
    from tpgan_tpu.train.gan_trainer import decode_u8_batch

    cfg = make_config(
        {
            "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
            "D": {"fm_multiplier": 0.25},
            "compute_dtype": "float32",
            "train": {"batch_size": 4},
        }
    )
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, gen, disc, g_tx, d_tx))

    fbatch = synthetic_gan_batch(4, seed=3)
    ubatch = {
        k: (np.clip((v + 1.0) * 127.5, 0, 255).astype(np.uint8)
            if k != "label" else v)
        for k, v in fbatch.items()
    }
    # decode_u8_batch reproduces the exact native-kernel mapping
    dec = decode_u8_batch({k: jnp.asarray(v) for k, v in ubatch.items()})
    from tpgan_tpu.data import native

    np.testing.assert_allclose(
        np.asarray(dec["img"]), native.u8_to_pm1(ubatch["img"]), atol=1e-7
    )
    assert dec["label"].dtype == jnp.int32

    state2, metrics = step(
        state, {k: jnp.asarray(v) for k, v in ubatch.items()},
        jax.random.PRNGKey(1),
    )
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_grad_accum_step_matches_structure_and_learns():
    """train.grad_accum_steps=2: the jitted step scans two microbatches,
    averages grads, and performs ONE optimizer update per network — the
    metrics keys, state structure, and descent behaviour match the plain
    step. (TPU rationale: critic/GP activation peak scales with the
    microbatch, docs/BENCHMARKS.md HBM wall.)"""
    cfg = make_config({**SMALL, "train": {"grad_accum_steps": 2}})
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx), donate_argnums=0
    )
    plain_cfg = make_config(SMALL)
    plain = jax.jit(
        make_gan_train_step(plain_cfg, gen, disc, g_tx, d_tx),
        donate_argnums=0,
    )

    rng = np.random.RandomState(0)
    batch = _rand_batch(rng, b=4)  # 2 microbatches of 2
    g_before = np.asarray(
        state.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    )

    state_p, m_plain = plain(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(1)
    )
    state_a, m_accum = step(state, batch, jax.random.PRNGKey(1))

    assert int(state_a.step) == 1
    assert set(m_accum) == set(m_plain)
    for k, v in m_accum.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(m_accum["d_gradient_penalty"]) > 0.0
    # both networks moved, and the accumulated update is the same order
    # of magnitude as the plain full-batch update (same Adam lr)
    g_after_a = np.asarray(
        state_a.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    )
    g_after_p = np.asarray(
        state_p.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    )
    assert not np.allclose(g_after_a, g_before)
    da = np.abs(g_after_a - g_before).mean()
    dp = np.abs(g_after_p - g_before).mean()
    assert 0.2 < da / dp < 5.0

    # batch not divisible by accum -> clear trace-time error
    import pytest

    with pytest.raises(ValueError, match="grad_accum_steps"):
        step(state_a, _rand_batch(np.random.RandomState(1), b=3),
             jax.random.PRNGKey(2))


def test_ema_tracking_and_eval_params():
    """train.ema_decay>0: the jitted step lerps an EMA copy of the G
    weights (standard GAN quality lever); eval_g_params prefers it.
    With decay=0 the state carries no EMA leaves and eval_g_params
    falls back to the live weights."""
    from tpgan_tpu.train.gan_trainer import eval_g_params

    cfg = make_config({**SMALL, "train": {"ema_decay": 0.9}})
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    # EMA initialized to a copy of the live params
    ref = state.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    ema0 = state.g_ema_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(ema0), np.asarray(ref))

    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx), donate_argnums=0
    )
    batch = _rand_batch(np.random.RandomState(0))
    prev_params = jax.tree.map(jnp.copy, state.g_params)
    state1, _ = step(state, batch, jax.random.PRNGKey(1))

    # one step from ema==prev_params: ema1 = 0.9*prev + 0.1*new, exactly
    want = jax.tree.map(
        lambda p, n: 0.9 * p + 0.1 * n, prev_params, state1.g_params
    )
    got = state1.g_ema_params
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        # atol for denormal-scale leaves: XLA fuses the lerp into an FMA
        # whose rounding differs from the host computation at ~1e-13
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-9
        )

    # eval_g_params: EMA when tracked, live otherwise (decay=0 opts out
    # of the 0.99 default the round-4 A/B set)
    assert eval_g_params(state1) is state1.g_ema_params
    cfg0 = make_config({**SMALL, "train": {"ema_decay": 0.0}})
    state0, *_ = create_gan_state(cfg0, jax.random.PRNGKey(0))
    assert state0.g_ema_params == {}
    assert eval_g_params(state0) is state0.g_params


def test_ema_updates_in_grad_accum_step():
    """EMA tracking composes with grad accumulation: the microbatched
    step updates the EMA copy from the post-update weights too."""
    cfg = make_config(
        {**SMALL, "train": {"ema_decay": 0.5, "grad_accum_steps": 2}}
    )
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(
        make_gan_train_step(cfg, gen, disc, g_tx, d_tx), donate_argnums=0
    )
    batch = _rand_batch(np.random.RandomState(0))
    prev_params = jax.tree.map(jnp.copy, state.g_params)
    state1, _ = step(state, batch, jax.random.PRNGKey(1))
    want = jax.tree.map(
        lambda p, n: 0.5 * p + 0.5 * n, prev_params, state1.g_params
    )
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(state1.g_ema_params)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-9
        )


def test_ema_state_checkpoint_roundtrip(tmp_path):
    """A state saved without EMA (ema_decay=0, empty subtree) restores
    into a fresh ema-off template — the old-checkpoint compat contract;
    and an EMA-tracking state round-trips its EMA leaves."""
    from tpgan_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg0 = make_config({**SMALL, "train": {"ema_decay": 0.0}})
    state0, *_ = create_gan_state(cfg0, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "off"), 1, state0)
    tmpl0, *_ = create_gan_state(cfg0, jax.random.PRNGKey(1))
    restored0 = restore_checkpoint(str(tmp_path / "off"), tmpl0)
    np.testing.assert_array_equal(
        np.asarray(restored0.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]),
        np.asarray(state0.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]),
    )

    cfg1 = make_config({**SMALL, "train": {"ema_decay": 0.99}})
    state1, *_ = create_gan_state(cfg1, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "on"), 1, state1)
    tmpl1, *_ = create_gan_state(cfg1, jax.random.PRNGKey(1))
    restored1 = restore_checkpoint(str(tmp_path / "on"), tmpl1)
    for a, b in zip(
        jax.tree.leaves(state1.g_ema_params),
        jax.tree.leaves(restored1.g_ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enable_ema_on_pre_ema_checkpoint(tmp_path):
    """restore_gan_checkpoint: turning train.ema_decay on for a run
    whose checkpoints predate EMA tracking restores the live state and
    seeds the EMA subtree from the restored generator weights; a
    genuinely incompatible layout still fails."""
    import pytest

    from tpgan_tpu.train.checkpoint import (
        restore_gan_checkpoint,
        save_checkpoint,
    )

    cfg_off = make_config({**SMALL, "train": {"ema_decay": 0.0}})
    state_off, *_ = create_gan_state(cfg_off, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ck"), 7, state_off)

    cfg_on = make_config({**SMALL, "train": {"ema_decay": 0.9}})
    tmpl, *_ = create_gan_state(cfg_on, jax.random.PRNGKey(1))
    restored = restore_gan_checkpoint(str(tmp_path / "ck"), tmpl)
    ref = state_off.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(
            restored.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
        ),
        np.asarray(ref),
    )
    # EMA seeded from the restored live weights
    for a, b in zip(
        jax.tree.leaves(restored.g_ema_params),
        jax.tree.leaves(restored.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(FileNotFoundError):
        restore_gan_checkpoint(str(tmp_path / "missing"), tmpl)

    # reverse direction: an EMA-tracking checkpoint restores into an
    # EMA-off template (live weights kept, EMA subtree dropped) — how
    # the live-vs-EMA quality comparison scores the same checkpoint
    state_on, *_ = create_gan_state(cfg_on, jax.random.PRNGKey(2))
    save_checkpoint(str(tmp_path / "ck_on"), 3, state_on)
    tmpl_off, *_ = create_gan_state(cfg_off, jax.random.PRNGKey(3))
    r2 = restore_gan_checkpoint(str(tmp_path / "ck_on"), tmpl_off)
    assert len(jax.tree.leaves(r2.g_ema_params)) == 0
    np.testing.assert_array_equal(
        np.asarray(
            r2.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
        ),
        np.asarray(
            state_on.g_params["global_pathway"]["conv0_conv"]["conv"]["kernel"]
        ),
    )
