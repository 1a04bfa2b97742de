"""Checkpointing: Orbax save AND restore (the reference only saves —
``save_model``/``save_optimizer`` at UtilityMethods.py:58-103 — and has no
load function anywhere; the ``train['resume_*']`` keys exist unread at
config.py:56-57), plus a PyTorch ``.pth`` -> pytree import tool for
pixel-parity validation against reference checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax


# --------------------------------------------------------------------------
# Orbax save/restore
# --------------------------------------------------------------------------

def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


_async_managers = {}


def save_checkpoint(
    directory: str, step: int, state: Any, max_to_keep: int = 5,
    block: bool = True,
):
    """Save a pytree (e.g. GANTrainState: params + optimizer state + step)
    under ``directory/<step>``.

    ``block=False`` returns as soon as the on-device state is snapshotted
    and writes in the background (Orbax async) — the training loop keeps
    stepping while the previous checkpoint flushes. The manager is kept
    alive per directory; ``finalize_checkpoints`` (or the next blocking
    save) joins outstanding writes."""
    import orbax.checkpoint as ocp

    if block:
        mgr = _manager(directory, max_to_keep)
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
        mgr.close()
        return
    mgr = _async_managers.get(directory)
    if mgr is None:
        mgr = _async_managers[directory] = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))


def finalize_checkpoints(directory: Optional[str] = None):
    """Join background checkpoint writes (one directory, or all)."""
    dirs = [directory] if directory else list(_async_managers)
    for d in dirs:
        mgr = _async_managers.pop(d, None)
        if mgr is not None:
            mgr.wait_until_finished()
            mgr.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state_like: Any, step: Optional[int] = None):
    """Restore into the structure of ``state_like``; returns the restored
    pytree. ``step=None`` restores the latest. The checkpoint's tree must
    match the template — resuming across incompatible state layouts is an
    error by design."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
    mgr.close()
    return out


def restore_gan_checkpoint(directory: str, state_like: Any, step: Optional[int] = None):
    """:func:`restore_checkpoint` specialised for ``GANTrainState``:
    tolerates flipping ``train.ema_decay`` across a checkpoint boundary
    in either direction. Enabling EMA on a pre-EMA run: the checkpoint
    restores against an EMA-free template and the EMA subtree
    initialises from the restored live generator weights (the correct
    EMA seed). Disabling EMA on an EMA-tracking checkpoint: the extra
    subtree restores against a params-shaped template and is dropped,
    so eval scores the LIVE weights (how the live-vs-EMA quality A/B is
    measured). Any other layout mismatch still fails loudly."""
    try:
        return restore_checkpoint(directory, state_like, step)
    except FileNotFoundError:
        raise
    except Exception:
        import jax.numpy as jnp

        if getattr(state_like, "g_ema_params", None):
            # template tracks EMA, checkpoint predates it
            restored = restore_checkpoint(
                directory, state_like.replace(g_ema_params={}), step
            )
            return restored.replace(
                g_ema_params=jax.tree.map(jnp.copy, restored.g_params)
            )
        # checkpoint tracks EMA, template does not: the EMA subtree is
        # shaped exactly like g_params
        with_ema = state_like.replace(
            g_ema_params=jax.tree.map(jnp.copy, state_like.g_params)
        )
        restored = restore_checkpoint(directory, with_ema, step)
        return restored.replace(g_ema_params={})


# --------------------------------------------------------------------------
# PyTorch .pth import (parity validation path)
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``state_dict`` (or the reference's optimizer bundle,
    which nests the model under 'model' — UtilityMethods.py:95-99) into
    {name: np.ndarray}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def conv_weight(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """torch Conv2d (out,in,kh,kw) -> HWIO."""
    return sd[name].transpose(2, 3, 1, 0)


def deconv_weight(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """torch ConvTranspose2d (in,out,kh,kw) -> our (kh,kw,in,out)."""
    return sd[name].transpose(2, 3, 0, 1)


def depthwise_weight(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """torch grouped conv (out, in/groups=1, kh, kw) -> (kh,kw,1,out)."""
    return sd[name].transpose(2, 3, 1, 0)


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def import_mobilenet_v2_pth(path: str):
    """Map a reference MobileNetV2 landmark-model checkpoint
    (saved by UtilityMethods.save_model from the model defined at
    MobileNetV2.py:122-218) onto our parameter tree.

    Returns {"params": ..., "batch_stats": ...} ready for
    ``MobileNetV2.apply``. Used by the pixel-parity test path.
    """
    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"] = {"kernel": conv_weight(sd, "conv1.0.weight")}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "conv1.1")

    n_blocks = 0
    while f"bottlenecks.{n_blocks}.conv.0.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        base = f"bottlenecks.{i}.conv"
        blk: Dict[str, Any] = {
            "expand": {"kernel": conv_weight(sd, f"{base}.0.weight")},
            "depthwise": {"kernel": depthwise_weight(sd, f"{base}.3.weight")},
            "project": {"kernel": conv_weight(sd, f"{base}.6.weight")},
        }
        bstats: Dict[str, Any] = {}
        blk["expand_bn"], bstats["expand_bn"] = _bn(sd, f"{base}.1")
        blk["depthwise_bn"], bstats["depthwise_bn"] = _bn(sd, f"{base}.4")
        blk["project_bn"], bstats["project_bn"] = _bn(sd, f"{base}.7")
        params[f"block{i}"] = blk
        stats[f"block{i}"] = bstats

    params["conv2"] = {"kernel": conv_weight(sd, "conv2.0.weight")}
    params["conv2_bn"], stats["conv2_bn"] = _bn(sd, "conv2.1")

    i = 0
    while f"extra_layers.{i}.weight" in sd:
        params[f"extra{i}"] = {
            "kernel": conv_weight(sd, f"extra_layers.{i}.weight"),
            "bias": sd[f"extra_layers.{i}.bias"],
        }
        i += 1

    head: Dict[str, Any] = {}
    j = 0
    while f"ssd_head.location_layer.{j}.weight" in sd:
        head[f"loc{j}"] = {
            "kernel": conv_weight(sd, f"ssd_head.location_layer.{j}.weight"),
            "bias": sd[f"ssd_head.location_layer.{j}.bias"],
        }
        head[f"cls{j}"] = {
            "kernel": conv_weight(sd, f"ssd_head.classification_layer.{j}.weight"),
            "bias": sd[f"ssd_head.classification_layer.{j}.bias"],
        }
        j += 1
    params["ssd_head"] = head

    as_jnp = lambda t: jax.tree.map(np.asarray, t)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


# --------------------------------------------------------------------------
# Generator / Discriminator .pth import (reference D_and_G_model.py naming)
# --------------------------------------------------------------------------
#
# The reference Generator/Discriminator CONSTRUCT fine (torch.save of their
# state_dicts is possible) even though GlobalPathway.forward cannot run as
# written (the 72-vs-75 channel defect, SURVEY.md §3.2). These importers map
# such checkpoints onto our trees for pixel-parity validation. Layout
# targeted: the GAN config (use_batchnorm=False, config.py:62,68) — conv
# factories emit [Conv2d, act] (conv at subindex 0) or
# [ReflectionPad2d, Conv2d, act] for 4-list padding (conv at subindex 1).
#
# The 72->75 defect is healed by zero-extension: add_conv_and_deconv_128's
# weights gain 3 zero input channels (so I128's raw channels are ignored,
# exactly the constructed reference semantics) and 3 zero output channels;
# enhance_features_128/conv5 gain matching zero input channels at the
# insertion offset. The imported model's forward equals the computation the
# reference's weights define.
#
# Validation scope (VERDICT r4): these importers are round-trip-tested
# against SELF-BUILT torch module trees whose state_dict naming mirrors
# D_and_G_model.py / the save_model layout (UtilityMethods.py:58-103) —
# no public author-trained .pth exists to test against, so any drift in
# the author's real key naming would surface only on first contact with
# a real checkpoint. tests/test_reference_checkpoint_import.py documents
# the exact naming contract assumed.


def _zero_extend(w: np.ndarray, axis: int, count: int, at: int) -> np.ndarray:
    """Insert ``count`` zero slices into ``w`` along ``axis`` at ``at``."""
    shape = list(w.shape)
    shape[axis] = count
    zeros = np.zeros(shape, w.dtype)
    before = np.take(w, range(at), axis=axis)
    after = np.take(w, range(at, w.shape[axis]), axis=axis)
    return np.concatenate([before, zeros, after], axis=axis)


def _conv_p(sd, prefix: str, reflect: bool = False) -> Dict[str, np.ndarray]:
    idx = 1 if reflect else 0
    out = {"kernel": conv_weight(sd, f"{prefix}.{idx}.weight")}
    bias_name = f"{prefix}.{idx}.bias"
    if bias_name in sd:
        out["bias"] = sd[bias_name]
    return out


def _deconv_p(sd, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": deconv_weight(sd, f"{prefix}.0.weight")}
    if f"{prefix}.0.bias" in sd:
        out["bias"] = sd[f"{prefix}.0.bias"]
    return out


def _rb_p(sd, prefix: str, reflect: bool = False) -> Dict[str, Any]:
    return {
        "conv0": {"conv": _conv_p(sd, f"{prefix}.layers.0", reflect)},
        "conv1": {"conv": _conv_p(sd, f"{prefix}.layers.1", reflect)},
    }


def _local_pathway_params(sd, prefix: str) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(4):
        p[f"conv{i}_conv"] = {"conv": _conv_p(sd, f"{prefix}.conv{i}.0")}
        p[f"conv{i}_res"] = _rb_p(sd, f"{prefix}.conv{i}.1")
    for j in range(3):
        p[f"dec{j}_deconv"] = {"deconv": _deconv_p(sd, f"{prefix}.deconv{j}")}
        p[f"dec{j}_select_conv"] = {
            "conv": _conv_p(sd, f"{prefix}.after_select{j}.0")
        }
        p[f"dec{j}_select_res"] = _rb_p(sd, f"{prefix}.after_select{j}.1")
    p["local_img"] = {"conv": _conv_p(sd, f"{prefix}.local_img")}
    return p


def import_generator_pth(path: str) -> Dict[str, Any]:
    """Reference Generator state_dict -> {"params": ...} for our
    Generator (use_batchnorm=False layout)."""
    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {}

    for part, ours in (
        ("local_pathway_left_eye", "local_left_eye"),
        ("local_pathway_right_eye", "local_right_eye"),
        ("local_pathway_nose", "local_nose"),
        ("local_pathway_mouth", "local_mouth"),
    ):
        params[ours] = _local_pathway_params(sd, part)

    g = "global_pathway"
    gp: Dict[str, Any] = {}
    for i in range(5):
        gp[f"conv{i}_conv"] = {"conv": _conv_p(sd, f"{g}.conv{i}.0")}
        n_res = 4 if i == 4 else 1
        for j in range(n_res):
            gp[f"conv{i}_res{j}"] = _rb_p(sd, f"{g}.conv{i}.{1 + j}")

    # fc1: torch flattens CHW, we flatten HWC
    w = sd[f"{g}.fc1.weight"]  # (512, 512*8*8)
    w_hwc = np.transpose(w.reshape(512, 512, 8, 8), (0, 2, 3, 1)).reshape(
        512, -1
    )
    gp["fc1"] = {"kernel": w_hwc.T, "bias": sd[f"{g}.fc1.bias"]}

    for name in ("deconv_8", "deconv_32", "deconv_64", "deconv_128"):
        gp[name] = {"deconv": _deconv_p(sd, f"{g}.{name}")}

    gp["add_8"] = _rb_p(sd, f"{g}.add_conv_and_deconv_8", reflect=True)
    for j in range(2):
        gp[f"enhance_8_{j}"] = _rb_p(
            sd, f"{g}.enhance_features_8.{j}", reflect=True
        )
    gp["upsample_16"] = {"deconv": _deconv_p(sd, f"{g}.upsample_16")}
    gp["add_16"] = _rb_p(sd, f"{g}.add_conv_and_deconv_16")
    for j in range(2):
        gp[f"enhance_16_{j}"] = _rb_p(sd, f"{g}.enhance_features_16.{j}")
    gp["upsample_32"] = {"deconv": _deconv_p(sd, f"{g}.upsample_32")}
    gp["add_32"] = _rb_p(sd, f"{g}.add_conv_and_deconv_32")
    for j in range(2):
        gp[f"enhance_32_{j}"] = _rb_p(sd, f"{g}.enhance_features_32.{j}")
    gp["upsample_64"] = {"deconv": _deconv_p(sd, f"{g}.upsample_64")}
    gp["add_64"] = _rb_p(sd, f"{g}.add_conv_and_deconv_64")
    for j in range(2):
        gp[f"enhance_64_{j}"] = _rb_p(sd, f"{g}.enhance_features_64.{j}")
    gp["upsample_128"] = {"deconv": _deconv_p(sd, f"{g}.upsample_128")}

    # --- the 72 -> 75 zero-extension (see module comment) ---
    a128 = _rb_p(sd, f"{g}.add_conv_and_deconv_128")
    for cname in ("conv0", "conv1"):
        k = a128[cname]["conv"]["kernel"]  # (7,7,in,out)
        k = _zero_extend(k, axis=2, count=3, at=72)   # ignore I128 inputs
        k = _zero_extend(k, axis=3, count=3, at=72)   # 3 dead outputs
        a128[cname]["conv"]["kernel"] = k
        if "bias" in a128[cname]["conv"]:
            a128[cname]["conv"]["bias"] = _zero_extend(
                a128[cname]["conv"]["bias"], 0, 3, 72
            )
    gp["add_128"] = a128

    # enhance_features_128 / conv5 consume the concat
    # [upsample(64), add128(72->75), feat(64), img(3)]: insert the 3 new
    # input channels at offset 64 + 72 = 136
    e128 = _rb_p(sd, f"{g}.enhance_features_128.0")
    for cname in ("conv0", "conv1"):
        k = _zero_extend(e128[cname]["conv"]["kernel"], 2, 3, 136)
        if cname == "conv1":  # out stays == in for the identity add
            k = _zero_extend(k, 3, 3, 136)
            if "bias" in e128[cname]["conv"]:
                e128[cname]["conv"]["bias"] = _zero_extend(
                    e128[cname]["conv"]["bias"], 0, 3, 136
                )
        else:  # conv0: in==203-widened, out==in for RB conv0 too
            k = _zero_extend(k, 3, 3, 136)
            if "bias" in e128[cname]["conv"]:
                e128[cname]["conv"]["bias"] = _zero_extend(
                    e128[cname]["conv"]["bias"], 0, 3, 136
                )
        e128[cname]["conv"]["kernel"] = k
    gp["enhance_128"] = e128

    conv5 = {"conv": _conv_p(sd, f"{g}.conv5.0")}
    conv5["conv"]["kernel"] = _zero_extend(conv5["conv"]["kernel"], 2, 3, 136)
    gp["conv5_conv"] = conv5
    gp["conv5_res"] = _rb_p(sd, f"{g}.conv5.1")
    gp["conv6"] = {"conv": _conv_p(sd, f"{g}.conv6")}
    gp["decoded_img128"] = {"conv": _conv_p(sd, f"{g}.decoded_img128")}
    params["global_pathway"] = gp

    params["feature_predict"] = {
        "fc": {
            "kernel": sd["feature_predict.fc.weight"].T,
            "bias": sd["feature_predict.fc.bias"],
        }
    }
    return {"params": jax.tree.map(np.asarray, params)}


def import_discriminator_pth(path: str) -> Dict[str, Any]:
    """Reference Discriminator state_dict (D_and_G_model.py:409-435,
    no-BN layout) -> {"params": ...} for our Discriminator. Sequential
    indices: convs at model.{0,1,2,3,5}, residual blocks at model.{4,6},
    head at model.7."""
    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {}
    conv_slots = {0: "conv0", 1: "conv1", 2: "conv2", 3: "conv3", 5: "conv4"}
    for slot, ours in conv_slots.items():
        params[ours] = {"conv": _conv_p(sd, f"model.{slot}")}
    params["res3"] = _rb_p(sd, "model.4")
    params["res4"] = _rb_p(sd, "model.6")
    params["head"] = {"conv": _conv_p(sd, "model.7")}
    return {"params": jax.tree.map(np.asarray, params)}
