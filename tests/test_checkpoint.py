"""Checkpoint save/restore (the capability the reference lacks — no load
function exists anywhere, UtilityMethods.py:58-103) and the torch .pth
import path."""

import numpy as np

import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from tpgan_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {
        "step": jnp.asarray(7),
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state)
    assert latest_step(d) == 7

    like = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(d, like)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_torch_pth_import_mobilenet(tmp_path):
    """Round-trip: save a torch-layout state dict with the reference's
    module names, import, and check shapes/layout mapping."""
    import torch

    from tpgan_tpu.train.checkpoint import import_mobilenet_v2_pth

    sd = {}
    sd["conv1.0.weight"] = torch.randn(32, 3, 3, 3)
    for n, (w, b, m, v) in {
        "conv1.1": (32,) * 4,
    }.items():
        sd[f"{n}.weight"] = torch.randn(w)
        sd[f"{n}.bias"] = torch.randn(b)
        sd[f"{n}.running_mean"] = torch.randn(m)
        sd[f"{n}.running_var"] = torch.rand(v) + 0.5

    # one bottleneck block (16 -> 16, expand 6)
    base = "bottlenecks.0.conv"
    sd[f"{base}.0.weight"] = torch.randn(96, 16, 1, 1)
    sd[f"{base}.3.weight"] = torch.randn(96, 1, 3, 3)
    sd[f"{base}.6.weight"] = torch.randn(16, 96, 1, 1)
    for bn, c in ((f"{base}.1", 96), (f"{base}.4", 96), (f"{base}.7", 16)):
        sd[f"{bn}.weight"] = torch.randn(c)
        sd[f"{bn}.bias"] = torch.randn(c)
        sd[f"{bn}.running_mean"] = torch.randn(c)
        sd[f"{bn}.running_var"] = torch.rand(c) + 0.5

    sd["conv2.0.weight"] = torch.randn(1280, 320, 1, 1)
    for bn, c in (("conv2.1", 1280),):
        sd[f"{bn}.weight"] = torch.randn(c)
        sd[f"{bn}.bias"] = torch.randn(c)
        sd[f"{bn}.running_mean"] = torch.randn(c)
        sd[f"{bn}.running_var"] = torch.rand(c) + 0.5

    sd["extra_layers.0.weight"] = torch.randn(512, 1280, 1, 1)
    sd["extra_layers.0.bias"] = torch.randn(512)
    sd["ssd_head.location_layer.0.weight"] = torch.randn(8, 96, 3, 3)
    sd["ssd_head.location_layer.0.bias"] = torch.randn(8)
    sd["ssd_head.classification_layer.0.weight"] = torch.randn(20, 96, 3, 3)
    sd["ssd_head.classification_layer.0.bias"] = torch.randn(20)

    path = str(tmp_path / "model_epoch_0.pth")
    torch.save(sd, path)

    out = import_mobilenet_v2_pth(path)
    p, s = out["params"], out["batch_stats"]
    assert p["stem"]["kernel"].shape == (3, 3, 3, 32)
    assert p["block0"]["expand"]["kernel"].shape == (1, 1, 16, 96)
    assert p["block0"]["depthwise"]["kernel"].shape == (3, 3, 1, 96)
    assert p["block0"]["project"]["kernel"].shape == (1, 1, 96, 16)
    assert s["block0"]["expand_bn"]["mean"].shape == (96,)
    assert p["extra0"]["kernel"].shape == (1, 1, 1280, 512)
    assert p["ssd_head"]["loc0"]["kernel"].shape == (3, 3, 96, 8)
    np.testing.assert_allclose(
        np.asarray(p["stem"]["kernel"]),
        sd["conv1.0.weight"].numpy().transpose(2, 3, 1, 0),
    )

    # the optimizer-bundle format nests the model under 'model'
    # (UtilityMethods.py:95-99)
    bundle_path = str(tmp_path / "optimizer_epoch_0.pth")
    torch.save({"optimizer": {}, "model": sd, "epoch": 0}, bundle_path)
    out2 = import_mobilenet_v2_pth(bundle_path)
    np.testing.assert_allclose(
        np.asarray(out2["params"]["stem"]["kernel"]),
        np.asarray(p["stem"]["kernel"]),
    )


def test_gan_state_roundtrip(tmp_path):
    """GANTrainState (flax struct + optax state) survives Orbax
    save/restore — the full resume path the reference lacks."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from tpgan_tpu.train.gan_trainer import create_gan_state

    cfg = make_config(
        {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
         "D": {"fm_multiplier": 0.25}, "compute_dtype": "float32"}
    )
    state, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path / "gan")
    save_checkpoint(d, 0, jax.device_get(state))

    zeroed = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(d, zeroed)
    a = jax.tree.leaves(state.g_params)[0]
    b = jax.tree.leaves(restored.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
