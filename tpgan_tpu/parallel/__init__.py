"""Parallelism layer: device mesh construction and sharding rules.

The reference is strictly single-device (Pretrain.py:111-114; SURVEY.md
§2.2 found zero distributed code). Here scaling is declarative: build a
(data, model) mesh, annotate state/batch shardings, and let GSPMD insert
the ICI collectives — gradient all-reduce falls out of the mean-loss +
sharded-batch combination, tensor-parallel collectives fall out of
channel-sharded kernels."""

from tpgan_tpu.parallel.mesh import make_mesh, local_device_count
from tpgan_tpu.parallel.sharding import (
    batch_shardings,
    infer_param_shardings,
    replicated,
    shard_gan_state,
)

__all__ = [
    "make_mesh",
    "local_device_count",
    "batch_shardings",
    "infer_param_shardings",
    "replicated",
    "shard_gan_state",
]
