"""SSD-style landmark multi-task loss, re-expressed with fixed-shape
masked tensor ops so the whole thing jits onto the TPU
(reference: MobileNetV2.py:342-534 — whose positive-sample assignment is
Python for-loops over predictions with per-element ``.item()`` host syncs,
the single biggest host-side hot spot of the pretrain loop, SURVEY.md §3.1).

Algorithm parity, per batch element:

1. distances (N, 4) from every prediction to the 4 ground-truth points.
2. Per label: threshold = max of the k = ratio*N smallest distances;
   positives are predictions within threshold (MobileNetV2.py:394-412).
3. Each positive prediction is assigned its nearest label; unassigned
   predictions are background (:414-443).
4. loss = alpha * sum_label MSE(normalised positive coords, label coord)
        + beta * [ sum_label CE(positives, label)
                 + CE(random background subsample <= ratio_bg * #positives,
                      background class) ]                      (:480-533)

The background subsample uses uniform random ranking — the same
distribution as the reference's ``torch.multinomial(..., replacement=False)``
over a uniform weight vector (:505).

Everything is batched via vmap; nothing ever leaves the device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _per_example_loss(
    loc_pred: jnp.ndarray,  # (N, 2)
    cls_pred: jnp.ndarray,  # (N, C) logits, background = last class
    loc_true: jnp.ndarray,  # (8,) = 4 x (x, y)
    rng: jax.Array,
    *,
    image_size: Tuple[int, int],  # (height, width)
    alpha: float,
    beta: float,
    distance_threshold_ratio: float,
    ratio_non_background: float,
    assign_points: jnp.ndarray = None,  # (N, 2) static anchor centres
):
    n = loc_pred.shape[0]
    num_labels = 4
    lt = loc_true.reshape(num_labels, 2).astype(jnp.float32)
    lp = loc_pred.astype(jnp.float32)

    # (N, 4) euclidean ASSIGNMENT distances. Reference parity: measured
    # from the PREDICTIONS (MobileNetV2.py:388). Anchor-offset heads pass
    # ``assign_points`` (the static anchor grid) instead: the positive
    # set must be a stable property of the grid, because the decoder
    # commits to the argmax-score anchor — prediction-based assignment
    # lets a far cell with an accidentally-close long-range offset become
    # positive, and the scores never learn to prefer the near cells
    # (measured round 4: 32-84 px decode error on converging losses).
    ap = lp if assign_points is None else assign_points.astype(jnp.float32)
    d = jnp.sqrt(jnp.sum(jnp.square(ap[:, None, :] - lt[None, :, :]), axis=-1) + 1e-20)

    # per-label distance threshold from the k smallest (:399-401)
    k = max(int(distance_threshold_ratio * n), 1)
    neg_smallest, _ = lax.top_k(-d.T, k)  # (4, k)
    thresh = -neg_smallest[:, -1]  # k-th smallest distance per label
    pos_mask = d <= thresh[None, :]  # (N, 4)

    # nearest-label assignment among each prediction's positive labels
    # (:414-443): -1 => background
    d_masked = jnp.where(pos_mask, d, jnp.inf)
    assigned = jnp.argmin(d_masked, axis=1)
    has_label = jnp.any(pos_mask, axis=1)
    assigned = jnp.where(has_label, assigned, -1)

    # normalise coordinates to [0, 1] by (width, height) (:471-475)
    h, w = image_size
    size = jnp.asarray([w, h], jnp.float32)
    p = jnp.clip(lp / size, 0.0, 1.0)
    t = jnp.clip(lt / size, 0.0, 1.0)

    # location loss: per-label MSE over that label's positives, summed
    # (:481-489). MSELoss means over all elements = mean over positives of
    # the per-prediction coordinate-mean squared error.
    sq = jnp.mean(jnp.square(p[:, None, :] - t[None, :, :]), axis=-1)  # (N, 4)
    onehot = assigned[:, None] == jnp.arange(num_labels)[None, :]  # (N, 4)
    counts = jnp.sum(onehot, axis=0)  # (4,)
    per_label_mse = jnp.where(
        counts > 0, jnp.sum(sq * onehot, axis=0) / jnp.maximum(counts, 1), 0.0
    )
    location_loss = jnp.sum(per_label_mse)

    # classification: per-label CE over positives, summed (:520-528)
    logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), axis=-1)  # (N, C)
    ce_label = -logp[:, :num_labels]  # (N, 4)
    per_label_ce = jnp.where(
        counts > 0, jnp.sum(ce_label * onehot, axis=0) / jnp.maximum(counts, 1), 0.0
    )
    classification_loss = jnp.sum(per_label_ce)

    # background CE over a random subsample of at most
    # ratio_non_background * #positives background predictions (:492-517)
    bg_mask = assigned == -1
    n_pos = jnp.sum(counts)
    max_bg = jnp.floor(ratio_non_background * n_pos).astype(jnp.int32)
    u = jax.random.uniform(rng, (n,))
    order = jnp.argsort(jnp.where(bg_mask, u, jnp.inf))  # background first
    rank = jnp.argsort(order)  # rank of each prediction in that order
    keep_bg = bg_mask & (rank < max_bg)
    n_bg = jnp.sum(keep_bg)
    bg_ce = -logp[:, -1]
    classification_loss = classification_loss + jnp.where(
        n_bg > 0, jnp.sum(bg_ce * keep_bg) / jnp.maximum(n_bg, 1), 0.0
    )

    total = alpha * location_loss + beta * classification_loss
    return total, {
        "location_loss": location_loss,
        "classification_loss": classification_loss,
        "num_positives": n_pos.astype(jnp.float32),
    }


def multitask_landmark_loss(
    loc_pred: jnp.ndarray,  # (B, N, 2)
    cls_pred: jnp.ndarray,  # (B, N, C)
    loc_true: jnp.ndarray,  # (B, 8)
    rng: jax.Array,
    *,
    image_size: Tuple[int, int],
    alpha: float = 30.0,
    beta: float = 0.1,
    distance_threshold_ratio: float = 0.1,
    ratio_non_background: float = 5.0,
    assign_points: jnp.ndarray = None,
):
    """Batched multi-task landmark loss. Returns (mean total loss, aux
    dict of mean components). Defaults mirror config.py:25-27 and
    MultiTaskLoss.__init__ (MobileNetV2.py:343). ``assign_points``:
    optional (N, 2) static points (anchor centres) for the positive
    assignment — see _per_example_loss; batch-invariant, so it is closed
    over, not vmapped."""
    rngs = jax.random.split(rng, loc_pred.shape[0])
    fn = partial(
        _per_example_loss,
        image_size=image_size,
        alpha=alpha,
        beta=beta,
        distance_threshold_ratio=distance_threshold_ratio,
        ratio_non_background=ratio_non_background,
        assign_points=assign_points,
    )
    totals, aux = jax.vmap(fn)(loc_pred, cls_pred, loc_true, rngs)
    return jnp.mean(totals), jax.tree.map(jnp.mean, aux)
