"""Packed-shard dataset format for production input pipelines.

The reference reads 15 individual PNG files per training item through PIL
(DataAndDataset.py:206-215) — hundreds of filesystem operations and
decodes per batch. Here a one-time packing pass serialises a dataset into
fixed-shape uint8 shards (4x smaller than float32, zero decode cost);
the reader memory-maps the shards, slices batches without copies, and
converts uint8 -> [-1, 1] float through the native C++ kernel
(``tpgan_tpu.data.native``) on the way to the device.

Format: ``<out_dir>/shard_<i>_<key>.npy`` (standard .npy, mmap-able) +
``<out_dir>/index.json`` with keys, shapes, dtypes, and counts.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

INDEX_NAME = "index.json"


def pack_dataset(dataset, out_dir: str, shard_size: int = 1024) -> None:
    """Serialise an indexable dataset of dict items (float arrays in
    [-1, 1] plus integer 'label') into packed uint8 shards."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    keys = None
    shard_idx = 0
    meta: Dict = {"num_items": n, "shards": [], "keys": {}}
    # record item basenames when the source exposes them: downstream
    # consumers (yaw-weighted sampling) need the Multi-PIE camera token
    # per packed index without re-reading the original img.list
    src_list = getattr(dataset, "img_list", None)
    if src_list is not None and len(src_list) == n:
        meta["names"] = [os.path.basename(p) for p in src_list]

    for start in range(0, n, shard_size):
        items = [dataset[i] for i in range(start, min(start + shard_size, n))]
        if keys is None:
            keys = sorted(items[0].keys())
        for key in keys:
            arrs = np.stack([it[key] for it in items])
            if key == "label":
                data = arrs.astype(np.int32)
            else:
                data = np.clip((arrs + 1.0) * 127.5, 0, 255).astype(np.uint8)
            np.save(os.path.join(out_dir, f"shard_{shard_idx}_{key}.npy"), data)
            meta["keys"][key] = {
                "shape": list(data.shape[1:]),
                "dtype": str(data.dtype),
            }
        meta["shards"].append(len(items))
        shard_idx += 1

    with open(os.path.join(out_dir, INDEX_NAME), "w") as f:
        json.dump(meta, f)


class PackedDataset:
    """Memory-mapped reader over packed shards; item = the same dict the
    source dataset produced (uint8 converted back to [-1, 1] float via
    the native kernel).

    ``to_float=False`` keeps images as raw uint8 — the production input
    path: 4x less host work and host->device (tunnel) traffic, with the
    [-1, 1] conversion running ON DEVICE inside the jitted train step
    (gan_trainer decodes uint8 batches automatically)."""

    def __init__(self, directory: str, to_float: bool = True):
        with open(os.path.join(directory, INDEX_NAME)) as f:
            self.meta = json.load(f)
        self.directory = directory
        self.to_float = to_float
        self._mmaps: Dict[int, Dict[str, np.ndarray]] = {}
        self._offsets = np.cumsum([0] + self.meta["shards"])

    def __len__(self) -> int:
        return int(self.meta["num_items"])

    @property
    def names(self) -> Optional[List[str]]:
        """Per-item source basenames, when recorded at pack time; falls
        back to the ``img.list`` file next to the packed directory
        (pre-round-5 packs) — ``pack_dataset`` consumed that list in
        order, so index i of the pack is line i of the list."""
        if "names" in self.meta:
            return list(self.meta["names"])
        sibling = os.path.join(os.path.dirname(
            os.path.abspath(self.directory)), "img.list")
        if os.path.exists(sibling):
            with open(sibling) as f:
                lines = [l.strip() for l in f if l.strip()]
            if len(lines) == len(self):
                return [os.path.basename(p) for p in lines]
        return None

    def _shard_for(self, idx: int):
        shard = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return shard, idx - int(self._offsets[shard])

    def _maps(self, shard: int) -> Dict[str, np.ndarray]:
        if shard not in self._mmaps:
            self._mmaps[shard] = {
                key: np.load(
                    os.path.join(self.directory, f"shard_{shard}_{key}.npy"),
                    mmap_mode="r",
                )
                for key in self.meta["keys"]
            }
        return self._mmaps[shard]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from tpgan_tpu.data import native

        shard, local = self._shard_for(idx)
        maps = self._maps(shard)
        out = {}
        for key, arr in maps.items():
            rec = np.asarray(arr[local])
            if key != "label" and self.to_float:
                rec = native.u8_to_pm1(rec)
            out[key] = rec
        return out


# --------------------------------------------------------------------------
# Device-resident dataset mode
# --------------------------------------------------------------------------

def load_packed_to_device(directory: str) -> Dict[str, "object"]:
    """Load the whole packed dataset into device memory (uint8/int32),
    one array per key, stacked over items.

    Datasets that fit HBM (the full Multi-PIE-layout GAN protocol packs
    to ~0.4 GB uint8 against 16 GB on a v5e) never need a host input
    pipeline at all: batches are gathered ON DEVICE by index
    (:func:`device_batch_iterator`), so steady-state training performs
    ~zero host->device traffic — the step is never feed-bound, and
    remoted PJRT backends whose clients hold transfer buffers (measured
    here: the tunnel leaks the full buffer per ``device_put``) stay flat
    on host RAM instead of accumulating ~10 MB/step.
    """
    import jax

    ds = PackedDataset(directory, to_float=False)
    num_shards = len(ds.meta["shards"])
    out = {}
    for key in ds.meta["keys"]:
        parts = [
            np.load(
                os.path.join(directory, f"shard_{s}_{key}.npy"), mmap_mode="r"
            )
            for s in range(num_shards)
        ]
        host = np.concatenate(parts) if len(parts) > 1 else np.asarray(parts[0])
        out[key] = jax.device_put(host)
    return out


def load_pretrain_to_device(dataset, indices) -> Dict[tuple, Dict[str, "object"]]:
    """Device-resident loading for the landmark-pretrain protocol
    (CelebALandmarkDataset items: ``(image, label)``; reference data
    protocol DataAndDataset.py:60-176): decode every image ONCE on the
    host, group by bucket shape, stack each bucket into a single uint8
    image tensor + float32 label tensor, and ``device_put`` each bucket
    exactly once.

    Rationale: the pretrain loop's per-step host->device image transfer
    hits the same remoted-PJRT buffer leak the GAN path works around
    (measured: a 1024-bucket smoke accumulated 130 GB host RSS and was
    OOM-killed); with per-bucket HBM residency the steady-state H2D is
    the ~0.5 KB index vector. uint8 storage keeps the largest protocol
    (900 mixed 256-1024 px images) under ~3 GB HBM; the jitted step
    decodes to [0, 1] float on device (train/pretrain.py)."""
    import jax

    groups: Dict[tuple, list] = {}
    for i in indices:
        item = dataset[i]
        if item is None:  # reference collate_fn oversize drop
            continue
        img, lbl = item
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0, 0.0, 255.0).astype(np.uint8)
        groups.setdefault(img.shape, []).append((img, np.asarray(lbl, np.float32)))
    out: Dict[tuple, Dict[str, object]] = {}
    for key in sorted(groups):
        imgs, lbls = zip(*groups[key])
        out[key] = {
            "img": jax.device_put(np.stack(imgs)),
            "label": jax.device_put(np.stack(lbls)),
        }
    return out


def pixel_budget_batches(
    groups: Dict[tuple, Dict[str, "object"]], batch_size: int
) -> Dict[tuple, int]:
    """Per-bucket batch sizes holding the PIXEL budget constant:
    ``batch_size`` applies at the smallest bucket and larger buckets
    scale down by area (min 1). A fixed per-bucket image count otherwise
    scales activation memory with bucket area — measured: b=16 at the
    1024 bucket exhausted the 16 GB HBM that b=16 at 256 barely dents —
    while constant pixels/step keeps every bucket's program at the same
    activation footprint and MXU occupancy (static shapes per bucket)."""
    if not groups:
        return {}
    min_area = min(k[0] * k[1] for k in groups)
    return {
        k: max(1, int(batch_size * min_area / (k[0] * k[1])))
        for k in groups
    }


def device_bucketed_batch_iterator(
    groups: Dict[tuple, Dict[str, "object"]], batch_size: int, seed: int = 0,
    batch_for: Optional[Dict[tuple, int]] = None,
) -> Iterator[Tuple["object", "object"]]:
    """Infinite train iterator over device-resident pretrain buckets
    (:func:`load_pretrain_to_device`): each step picks a bucket with
    probability proportional to the number of steps that bucket needs
    per epoch (item count / its batch size — the per-image visit rate
    stays uniform across buckets, matching a shuffled host epoch in
    expectation), then gathers a with-replacement batch ON DEVICE.
    Yields ``(images_uint8, labels_f32)`` device tuples; per step only
    the index vector crosses the tunnel. ``batch_for`` overrides the
    batch size per bucket (see :func:`pixel_budget_batches`)."""
    import jax
    import jax.numpy as jnp

    take = jax.jit(lambda d, idx: jax.tree.map(lambda a: a[idx], d))
    keys = sorted(groups)
    bs = {k: (batch_for or {}).get(k, batch_size) for k in keys}
    steps = np.asarray(
        [int(groups[k]["img"].shape[0]) / bs[k] for k in keys], np.float64
    )
    probs = steps / steps.sum()
    rng = np.random.RandomState(seed)
    while True:
        k = keys[int(rng.choice(len(keys), p=probs))]
        idx = jnp.asarray(
            rng.randint(0, int(groups[k]["img"].shape[0]), size=(bs[k],)),
            jnp.int32,
        )
        b = take(groups[k], idx)
        yield b["img"], b["label"]


def device_bucketed_eval_batches(
    groups: Dict[tuple, Dict[str, "object"]], batch_size: int,
    batch_for: Optional[Dict[tuple, int]] = None,
) -> Iterator[Tuple["object", "object"]]:
    """One sequential pass over every item of every device-resident
    bucket (validation). Full batches slice by static offsets; the final
    partial batch of each bucket is yielded as-is (one extra XLA
    specialisation per bucket, same behaviour as the host
    ``bucketed_batch_iterator(drop_last=False)``)."""
    import jax
    import jax.numpy as jnp

    take = jax.jit(lambda d, idx: jax.tree.map(lambda a: a[idx], d))
    for k in sorted(groups):
        n = int(groups[k]["img"].shape[0])
        b_k = (batch_for or {}).get(k, batch_size)
        for start in range(0, n, b_k):
            idx = jnp.arange(start, min(start + b_k, n), dtype=jnp.int32)
            b = take(groups[k], idx)
            yield b["img"], b["label"]


def device_batch_iterator(
    data: Dict[str, "object"], batch_size: int, seed: int = 0,
    weights: Optional[np.ndarray] = None,
) -> Iterator[Dict[str, "object"]]:
    """Infinite iterator over on-device batches gathered by random index
    from a device-resident dataset (:func:`load_packed_to_device`).

    Per step the host only ships the index vector (batch_size x int32,
    ~0.5 KB) — the gather itself runs on device. Sampling is with
    replacement (the i.i.d. regime the WGAN-GP critic assumes).

    ``weights`` (len == dataset size, any positive scale) biases the
    sampling distribution — used for yaw-weighted sampling, which
    oversamples extreme-pose items so the rarest / hardest pose bins
    see enough gradient signal (train.yaw_weight_gamma). Host-side
    only: the jitted gather/step never sees the distribution change."""
    import jax
    import jax.numpy as jnp

    n = int(next(iter(data.values())).shape[0])
    take = jax.jit(lambda d, idx: jax.tree.map(lambda a: a[idx], d))
    rng = np.random.RandomState(seed)
    p = None
    if weights is not None:
        p = np.asarray(weights, np.float64)
        if p.shape != (n,):
            raise ValueError(f"weights shape {p.shape} != ({n},)")
        if (p < 0).any() or p.sum() <= 0:
            raise ValueError("weights must be non-negative with a "
                             "positive sum")
        p = p / p.sum()
    while True:
        if p is None:
            idx = rng.randint(0, n, size=(batch_size,))
        else:
            idx = rng.choice(n, size=(batch_size,), p=p)
        yield take(data, jnp.asarray(idx, jnp.int32))
