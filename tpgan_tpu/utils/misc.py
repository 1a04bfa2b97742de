"""Small utilities (reference: UtilityMethods.py)."""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np


def scale_channels(channels: Sequence[int], multiplier: float) -> List[int]:
    """Channel-width scaling: int(v * multiplier) per entry — the
    reference's ``elementwise_multiply_and_cast_to_int``
    (UtilityMethods.py:109-121)."""
    return [int(v * multiplier) for v in channels]


# Dlib 68-point index ranges for (left eye, right eye, nose, left mouth
# corner, right mouth corner) — reference: UtilityMethods.py:148. The
# reference's last range is (68, 68), which on a true 68-row array is an
# empty slice (NaN mean) — its landmark files evidently carry a 69th row.
FIVE_PTS_IDX = ((36, 41), (42, 47), (27, 35), (48, 48), (68, 68))


def five_landmarks_from_68(landmarks68: np.ndarray) -> np.ndarray:
    """Reduce dlib-style landmarks to 5 key points by averaging each index
    range (reference: UtilityMethods.py:147-164). Input (N, 2) with
    N >= 68; output float32 (5, 2).

    Documented deviation: for a standard 68-row array the reference's
    (68, 68) right-mouth range is out of bounds (NaN); we fall back to
    dlib's right mouth corner, index 54, in that case.
    """
    n = landmarks68.shape[0]
    out = []
    for lo, hi in FIVE_PTS_IDX:
        if lo >= n:  # reference's 69th-row quirk on a 68-row array
            lo = hi = 54
        out.append(np.mean(landmarks68[lo : hi + 1], axis=0))
    return np.asarray(out, np.float32)


def resize_image(
    x, size: Union[int, Tuple[int, int]], method: str = "bilinear"
):
    """Bilinear (default) image resize on NHWC or HWC jax arrays — the
    on-device equivalent of the reference's Tensor->PIL->Resize->Tensor
    round trip (UtilityMethods.py:123-145). ``size`` is (height, width)
    or a single int for square output."""
    import jax.image
    import jax.numpy as jnp

    h, w = (size, size) if isinstance(size, int) else size
    x = jnp.asarray(x)
    if x.ndim == 3:
        return jax.image.resize(x, (h, w, x.shape[-1]), method=method)
    if x.ndim == 4:
        return jax.image.resize(
            x, (x.shape[0], h, w, x.shape[-1]), method=method
        )
    raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
