"""bf16-vs-fp32 synthesis numerics and explicit cross-replica BatchNorm
(axis_name path) under shard_map."""

import numpy as np
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpgan_tpu.config import MeshConfig, make_config
from tpgan_tpu.ops.blocks import BatchNorm2d
from tpgan_tpu.parallel.mesh import make_mesh
from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn


def test_bf16_close_to_fp32():
    """The bf16 production path must track fp32 within bf16 resolution
    on the [-1, 1] output scale."""
    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32) * 0.3),
        "left_eye": jnp.asarray(rng.randn(1, 40, 40, 3).astype(np.float32) * 0.3),
        "right_eye": jnp.asarray(rng.randn(1, 40, 40, 3).astype(np.float32) * 0.3),
        "nose": jnp.asarray(rng.randn(1, 32, 40, 3).astype(np.float32) * 0.3),
        "mouth": jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 0.3),
    }
    z = jnp.zeros((1, 64), jnp.float32)

    small = {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
             "D": {"fm_multiplier": 0.25}}
    cfg32 = make_config({**small, "compute_dtype": "float32"})
    state, gen32, *_ = create_gan_state(cfg32, jax.random.PRNGKey(0))
    out32 = jax.jit(make_synthesize_fn(cfg32, gen32))(state.g_params, batch, z)

    cfg16 = make_config({**small, "compute_dtype": "bfloat16"})
    _, gen16, *_ = create_gan_state(cfg16, jax.random.PRNGKey(0))
    out16 = jax.jit(make_synthesize_fn(cfg16, gen16))(state.g_params, batch, z)

    diff = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    # bf16 has ~3 decimal digits; deep conv stacks accumulate, so allow
    # a generous but meaningful envelope
    assert diff.mean() < 0.05, diff.mean()
    assert np.corrcoef(
        np.asarray(out16, np.float32).ravel(), np.asarray(out32).ravel()
    )[0, 1] > 0.99


def test_syncbn_axis_name_matches_global_batch():
    """BatchNorm2d(axis_name=...) under shard_map computes the same
    statistics as a single-device BN over the full batch."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    mesh = make_mesh(MeshConfig(data=8, model=1))
    c = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 4, 4, c).astype(np.float32))

    bn_global = BatchNorm2d(c)
    v = bn_global.init(jax.random.PRNGKey(0), x)
    want, want_stats = bn_global.apply(
        v, x, train=True, mutable=["batch_stats"]
    )

    bn_sync = BatchNorm2d(c, axis_name="data")

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=(P("data"), P()),
    )
    def run(variables, xs):
        out, mutated = bn_sync.apply(
            variables, xs, train=True, mutable=["batch_stats"]
        )
        return out, mutated["batch_stats"]

    got, got_stats = jax.jit(run)(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_stats["mean"]),
        np.asarray(want_stats["batch_stats"]["mean"]),
        rtol=1e-5,
    )
    # unbiased-var update uses the GLOBAL n under axis_name
    np.testing.assert_allclose(
        np.asarray(got_stats["var"]),
        np.asarray(want_stats["batch_stats"]["var"]),
        rtol=1e-4,
    )
