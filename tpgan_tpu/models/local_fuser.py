"""LocalFuser — place the four part maps (left eye, right eye, nose,
mouth) at their canonical mean-landmark positions on a 128x128 canvas and
fuse with an elementwise max (reference: D_and_G_model.py:112-159).

TPU re-design: the reference pads each part to a full canvas and stacks
four 128x128xC maps before reducing. We instead scatter each part into
the canvas at its static offset with ``jax.lax.dynamic_update_slice``-free
padding and fold the max as we go — XLA fuses this into a single
elementwise pass over the canvas, and because every offset is static there
is no gather/scatter at all. A fused Pallas kernel for this op lives in
``tpgan_tpu.ops.pallas_kernels`` (used on TPU for the training hot path).

Geometry (reference: D_and_G_model.py:148-157, derived from the mean
128x128 landmark table at :119-129):

    part       size (W,H)   canvas slot (row=top, col=left)
    left_eye   (40, 40)     rows 19:59,  cols 18:58
    right_eye  (40, 40)     rows 18:58,  cols 65:105
    nose       (40, 32)     rows 47:79,  cols 43:83
    mouth      (48, 32)     rows 72:104, cols 40:88
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from tpgan_tpu.ops.geometry import CANVAS_SIZE, PART_GEOMETRY, PART_NAMES


def _place(part: jnp.ndarray, top: int, left: int) -> jnp.ndarray:
    """Zero-pad an NHWC part map into its static canvas slot."""
    _, h, w, _ = part.shape
    return jnp.pad(
        part,
        (
            (0, 0),
            (top, CANVAS_SIZE - top - h),
            (left, CANVAS_SIZE - left - w),
            (0, 0),
        ),
    )


def fuse_parts(
    left_eye: jnp.ndarray,
    right_eye: jnp.ndarray,
    nose: jnp.ndarray,
    mouth: jnp.ndarray,
) -> jnp.ndarray:
    """Max-fuse four NHWC part maps onto the 128x128 canvas.

    Works for any channel count (features, fake patches, or ground-truth
    patches — the reference calls its fuser with all three at
    D_and_G_model.py:396-398).
    """
    parts = (left_eye, right_eye, nose, mouth)
    out = None
    for name, part in zip(PART_NAMES, parts):
        (h, w), (top, left) = PART_GEOMETRY[name]
        if part.shape[1] != h or part.shape[2] != w:
            raise ValueError(
                f"{name} must be {h}x{w} (HxW), got {part.shape[1]}x{part.shape[2]}"
            )
        placed = _place(part, top, left)
        out = placed if out is None else jnp.maximum(out, placed)
    return out


def extract_parts(canvas: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Inverse of :func:`fuse_parts` placement: slice each part's canvas
    slot back out (used by the local pixel loss and tests)."""
    out = {}
    for name, ((h, w), (top, left)) in PART_GEOMETRY.items():
        out[name] = canvas[:, top : top + h, left : left + w, :]
    return out
