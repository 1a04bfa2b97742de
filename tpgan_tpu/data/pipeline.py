"""Host-side input pipeline with device prefetch.

The reference's loader is a synchronous, single-worker DataLoader with
per-step H2D copies (Pretrain.py:105-107,164-165). Here: a thread pool
decodes/preprocesses ahead of the training step, batches are stacked into
pinned numpy buffers, and a double-buffered ``jax.device_put`` keeps the
next batch in HBM while the current step runs — the step never waits on
the host once warm.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, List, Optional, Sequence

import numpy as np

import jax


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 4,
    indices: Optional[Sequence[int]] = None,
    epochs: Optional[int] = None,
) -> Iterator[Any]:
    """Yield stacked batches from an indexable dataset using a worker
    thread pool (PIL/numpy decode releases the GIL for the heavy parts).
    Items that return None are dropped (the reference's oversize filter,
    Pretrain.py:66-74)."""
    import concurrent.futures

    idxs = list(indices) if indices is not None else list(range(len(dataset)))
    rng = np.random.RandomState(seed)
    epoch = 0
    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        while epochs is None or epoch < epochs:
            order = idxs[:]
            if shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), batch_size):
                chunk = order[start : start + batch_size]
                if drop_last and len(chunk) < batch_size:
                    continue
                items = [x for x in pool.map(dataset.__getitem__, chunk) if x is not None]
                if not items:
                    continue
                yield _stack(items)
            epoch += 1


def bucketed_batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 4,
    indices: Optional[Sequence[int]] = None,
    epochs: Optional[int] = None,
) -> Iterator[Any]:
    """Like :func:`batch_iterator` for datasets whose items come in a few
    distinct shapes (multi-bucket pretraining, celeba.py ``buckets``):
    items accumulate per shape and a batch is emitted whenever one bucket
    fills, so every emitted batch is shape-homogeneous. With
    ``drop_last=False`` partial buckets flush at the end of each epoch.
    Each bucket shape compiles its own XLA program (static shapes)."""
    import concurrent.futures

    idxs = list(indices) if indices is not None else list(range(len(dataset)))
    rng = np.random.RandomState(seed)
    epoch = 0
    pending: dict = {}
    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        while epochs is None or epoch < epochs:
            order = idxs[:]
            if shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), batch_size):
                chunk = order[start : start + batch_size]
                for item in pool.map(dataset.__getitem__, chunk):
                    if item is None:
                        continue
                    key = _item_shape_key(item)
                    pending.setdefault(key, []).append(item)
                    if len(pending[key]) == batch_size:
                        yield _stack(pending.pop(key))
            if not drop_last:
                for key in list(pending):
                    yield _stack(pending.pop(key))
            epoch += 1


def _item_shape_key(item: Any):
    if isinstance(item, dict):
        return tuple((k, np.shape(v)) for k, v in sorted(item.items()))
    if isinstance(item, tuple):
        return tuple(np.shape(v) for v in item)
    return np.shape(item)


def _stack(items: List[Any]) -> Any:
    first = items[0]
    if isinstance(first, dict):
        return {k: np.stack([it[k] for it in items]) for k in first}
    if isinstance(first, tuple):
        return tuple(np.stack([it[i] for it in items]) for i in range(len(first)))
    return np.stack(items)


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    sharding=None,
) -> Iterator[Any]:
    """Asynchronously stage batches into device memory ``size`` deep.
    With a ``sharding``, batches land pre-sharded across the mesh (each
    host puts its slice; on a single host this is a split-put across
    local devices)."""

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    q: "collections.deque[Any]" = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield out
