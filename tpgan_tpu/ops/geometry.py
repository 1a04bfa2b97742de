"""Canonical face-part canvas geometry — the single source of truth for
the LocalFuser placement (reference: D_and_G_model.py:148-157, derived
from the mean 128x128 landmark table at :119-129) and the patch sizes
(reference: DataAndDataset.py:35-40).

    part       size (W,H)   canvas slot (row=top, col=left)
    left_eye   (40, 40)     rows 19:59,  cols 18:58
    right_eye  (40, 40)     rows 18:58,  cols 65:105
    nose       (40, 32)     rows 47:79,  cols 43:83
    mouth      (48, 32)     rows 72:104, cols 40:88

Dependency-free so ops kernels, models, and the data layer can all share
it without import cycles.
"""

from __future__ import annotations

from typing import Dict, Tuple

CANVAS_SIZE = 128

# name -> ((height, width), (top, left)); order matters (reference order).
PART_GEOMETRY: Dict[str, Tuple[Tuple[int, int], Tuple[int, int]]] = {
    "left_eye": ((40, 40), (19, 18)),
    "right_eye": ((40, 40), (18, 65)),
    "nose": ((32, 40), (47, 43)),
    "mouth": ((32, 48), (72, 40)),
}

PART_NAMES = tuple(PART_GEOMETRY.keys())
