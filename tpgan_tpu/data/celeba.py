"""CelebA landmark-pretraining data
(reference: PretrainDataset, DataAndDataset.py:60-176).

Parsing parity:
* skip the two header lines of ``list_landmarks_celeba.txt``; each row is
  11 whitespace fields: name + 5 (x, y) integer pairs (:123-139);
* mouth label = integer midpoint of the two mouth corners (``//2``,
  :142-143);
* images discovered by walking the root for ``*.jpg`` (:170-176).

TPU redesign: the reference feeds variable-size images at batch_size=1
(config.py:12) because shapes vary. We letterbox every image into a fixed
square bucket (aspect-preserving resize + zero pad) and scale the
landmark labels by the same transform, giving static shapes and real
batches. Oversized images (> general.image_max_size on either side,
reference collate_fn Pretrain.py:66-74) can optionally be dropped for
strict parity, though letterboxing makes the cap unnecessary.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _basename_any_sep(name: str) -> str:
    """Basename across BOTH path separators: the reference's corpus
    carries Windows-style names it splits on '\\' (DataAndDataset.py:77);
    a unix-built list may carry '/'. Keys are matched by plain basename
    either way."""
    return name.replace("\\", "/").rsplit("/", 1)[-1]


def parse_celeba_landmarks(txt_path: str) -> Dict[str, np.ndarray]:
    """label txt -> {image_name: float32 (8,) = 4 x (x, y)}.

    Real-corpus tolerances (the synthetic protocol writer is cleaner than
    the real CelebA file may be): CRLF line endings, BOM, runs of
    whitespace/tabs, float-formatted coordinates, name fields carrying
    Windows or unix path prefixes (keyed by basename, matching the
    reference's '\\' split at DataAndDataset.py:77), and unparseable rows
    (skipped, like the reference's len!=11 implicit skip)."""
    labels: Dict[str, np.ndarray] = {}
    with open(txt_path, "r", encoding="utf-8-sig") as f:
        lines = f.read().splitlines()
    for line in lines[2:]:
        parts = line.split()
        # >= 11: rows from annotated CelebA variants append extra
        # columns after the 10 coordinates (attribute dumps, bbox
        # exports) — the first 10 numbers after the name are the
        # landmark contract either way. <11 rows stay skipped (the
        # reference's implicit len!=11 skip).
        if len(parts) < 11:
            continue
        name = _basename_any_sep(parts[0])
        try:
            v = [int(float(p)) for p in parts[1:11]]
        except ValueError:
            continue
        lefteye = (v[0], v[1])
        righteye = (v[2], v[3])
        nose = (v[4], v[5])
        mouth = ((v[6] + v[8]) // 2, (v[7] + v[9]) // 2)
        labels[name] = np.asarray(
            [*lefteye, *righteye, *nose, *mouth], np.float32
        )
    return labels


def find_images(root: str, suffix: str = ".jpg") -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.lower().endswith(suffix):
                out.append(os.path.join(dirpath, f))
    out.sort()
    return out


def letterbox(
    image: np.ndarray, size: int, allow_upscale: bool = True
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize into a (size, size) zero-padded square.
    Returns (out, scale, (pad_left, pad_top)) so labels transform as
    ``xy * scale + pad``. With ``allow_upscale=False`` images smaller
    than the square are only padded (scale == 1) — native resolution,
    like the reference feeding raw images at batch 1 (config.py:12)."""
    from PIL import Image

    h, w = image.shape[:2]
    scale = size / max(h, w)
    if not allow_upscale:
        scale = min(scale, 1.0)
    nw, nh = max(int(round(w * scale)), 1), max(int(round(h * scale)), 1)
    img = Image.fromarray((image * 255).astype(np.uint8) if image.dtype != np.uint8 else image)
    img = img.resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    out = np.zeros((size, size) + image.shape[2:], np.float32)
    pad_left = (size - nw) // 2
    pad_top = (size - nh) // 2
    out[pad_top : pad_top + nh, pad_left : pad_left + nw] = arr
    return out, scale, (pad_left, pad_top)


class CelebALandmarkDataset:
    """Indexable dataset: item = (image (S, S, 3) float32 in [0, 1],
    label (8,) float32 in bucket coordinates).

    ``buckets``: optional ascending sizes (e.g. (256, 512, 1024)). Each
    image routes to the SMALLEST bucket >= max(h, w) — letterboxing is
    then pure zero-padding (scale == 1), so the label coordinates and the
    banded-accuracy thresholds keep the reference's *source-pixel*
    semantics (Pretrain.py:31-32) for every image up to the largest
    bucket (general.image_max_size, config.py:40); only larger images
    downscale. Without ``buckets``, everything resizes into the single
    ``image_size`` square (the round-1 behaviour: accuracy is then in the
    letterboxed frame, a 4x stricter band on a 1024px source)."""

    def __init__(
        self,
        txt_name: str,
        data_root_dir: str,
        image_size: int = 256,
        max_source_size: Optional[int] = None,
        buckets: Optional[Tuple[int, ...]] = None,
    ):
        self.labels = parse_celeba_landmarks(os.path.join(data_root_dir, txt_name))
        all_paths = find_images(data_root_dir)
        # keep only labelled images: os.walk collects every .jpg under the
        # root (reference DataAndDataset.py:170-174), and a partial corpus
        # or stray file would otherwise KeyError mid-epoch
        self.image_paths = [
            p for p in all_paths if os.path.basename(p) in self.labels
        ]
        dropped = len(all_paths) - len(self.image_paths)
        if dropped:
            print(f"[celeba] {dropped} image(s) without landmark rows skipped")
        self.image_size = image_size
        self.max_source_size = max_source_size
        self.buckets = tuple(sorted(buckets)) if buckets else None

    def __len__(self) -> int:
        return len(self.image_paths)

    def bucket_for(self, h: int, w: int) -> int:
        """Smallest bucket that fits (h, w) without downscaling; the
        largest bucket when nothing fits."""
        assert self.buckets
        side = max(h, w)
        for b in self.buckets:
            if side <= b:
                return b
        return self.buckets[-1]

    def __getitem__(self, idx: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        from PIL import Image

        path = self.image_paths[idx]
        name = os.path.basename(path)
        with Image.open(path) as im:
            im = im.convert("RGB")
            arr = np.asarray(im, np.uint8)
        if self.max_source_size is not None and (
            arr.shape[0] > self.max_source_size or arr.shape[1] > self.max_source_size
        ):
            return None  # reference collate_fn drop (Pretrain.py:66-74)
        size = (
            self.bucket_for(*arr.shape[:2]) if self.buckets else self.image_size
        )
        # bucket mode: pad-only (native resolution -> source-pixel labels)
        boxed, scale, (pl, pt) = letterbox(
            arr, size, allow_upscale=not self.buckets
        )
        label = self.labels[name].copy()
        label = label.reshape(4, 2) * scale + np.asarray([pl, pt], np.float32)
        return boxed, label.reshape(8)

    def split(
        self, train_ratio: float, val_ratio: float, seed: int = 0
    ) -> Tuple[List[int], List[int], List[int]]:
        """Random train/val/test index split; test = remainder, exactly as
        the reference computes it (Pretrain.py:96-102)."""
        n = len(self)
        n_train = int(n * train_ratio)
        n_val = int(n * val_ratio)
        perm = np.random.RandomState(seed).permutation(n)
        return (
            perm[:n_train].tolist(),
            perm[n_train : n_train + n_val].tolist(),
            perm[n_train + n_val :].tolist(),
        )
