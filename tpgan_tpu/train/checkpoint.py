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
    pytree. ``step=None`` restores the latest."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
    mgr.close()
    return out


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
