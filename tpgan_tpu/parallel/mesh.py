"""Device-mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from tpgan_tpu.config import MeshConfig


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh. ``data = -1`` consumes all devices not
    claimed by the model axis. On a TPU slice, ``jax.devices()`` ordering
    keeps ICI neighbours adjacent, so the trailing (model) axis — the one
    with the chattiest collectives — maps onto nearest-neighbour links."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model, 1)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = cfg.data if cfg.data != -1 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))
