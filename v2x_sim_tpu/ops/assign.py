"""GT -> anchor target assignment.

Analog of the reference's anchor assignment († coperception/utils/obj_util.py,
SURVEY.md §2.1): IoU-match GT boxes to the dense anchor grid, producing
classification labels, encoded regression targets, and the regression loss
mask.

TPU-first design — dense, regular, gather-light:
  1. Every BEV cell ranks the (static, padded) GT set by center distance
     and keeps its top-2 candidates — one (H, W, M) elementwise pass +
     two masked argmins, no sort.
  2. Exact rotated IoU runs densely against just those 2 candidates per
     (cell, anchor): (H, W, K, 2) pairs, pure VPU work.
  3. Each GT's single best anchor is forced positive through one tiny
     M-element scatter-max, so no GT is unlearnable.

Two earlier designs (scan+dynamic_update_slice windows; vmapped
dynamic_slice windows + a 10M-element packed scatter) compiled
pathologically on TPU — batched gathers/scatters with data-dependent
offsets are compile- and run-hostile there. Top-2-by-distance is exact
for the benchmark's box statistics (vehicles whose footprints overlap a
cell's anchor essentially never have 3+ centers closer than a third
box's); tests assert parity with a brute-force all-pairs oracle.

Runs on-device inside the streaming input pipeline (prepare_batch), or on
CPU in offline preprocessing, from the same jitted code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.ops.boxes import encode_boxes
from v2x_sim_tpu.ops.iou_sh import rotated_iou_auto as rotated_iou

#: Candidate GT per cell (by center distance).
_CANDS = 2


class AnchorTargets(NamedTuple):
    """Dense per-anchor training targets.

    labels: (H, W, K) int32 — 1 positive, 0 negative, -1 ignore.
    reg_targets: (H, W, K, 6) float32 — encoded box deltas (zero where not
      positive).
    reg_mask: (H, W, K) float32 — 1.0 where regression loss applies.
    best_iou: (H, W, K) float32 — max IoU of each anchor vs any GT.
    """

    labels: jnp.ndarray
    reg_targets: jnp.ndarray
    reg_mask: jnp.ndarray
    best_iou: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("config",))
def assign_targets(
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors: jnp.ndarray,
    config: Config,
) -> AnchorTargets:
    """Assign GT boxes to anchors.

    Args:
      gt_boxes: (M, 5) padded GT (x, y, l, w, yaw).
      gt_mask: (M,) bool validity.
      anchors: (H, W, K, 5) dense anchor grid (see ops.anchors.anchor_grid).
      config: static config (thresholds, grid geometry).

    Returns:
      AnchorTargets over the full (H, W, K) grid.
    """
    h, w, k, _ = anchors.shape
    m = gt_boxes.shape[0]
    pos_thr = config.anchors.pos_iou_threshold
    neg_thr = config.anchors.neg_iou_threshold
    dtype = anchors.dtype

    # ---- 1. top-2 GT candidates per cell by center distance ---------- #
    cell_x = anchors[:, :, 0, 0]  # (H, W): anchor centers == cell centers
    cell_y = anchors[:, :, 0, 1]
    dx = cell_x[:, :, None] - gt_boxes[None, None, :, 0]
    dy = cell_y[:, :, None] - gt_boxes[None, None, :, 1]
    d2 = dx * dx + dy * dy  # (H, W, M)
    d2 = jnp.where(gt_mask[None, None, :], d2, jnp.inf)

    c1 = jnp.argmin(d2, axis=-1)  # (H, W)
    d2_wo1 = jnp.where(
        jax.nn.one_hot(c1, m, dtype=bool), jnp.inf, d2
    )
    c2 = jnp.argmin(d2_wo1, axis=-1)
    cands = jnp.stack([c1, c2], axis=-1)  # (H, W, 2)
    cand_valid = jnp.take_along_axis(
        jnp.broadcast_to(gt_mask[None, None, :], d2.shape), cands, axis=-1
    )  # (H, W, 2)

    # ---- 2. exact IoU vs candidates ---------------------------------- #
    cand_boxes = gt_boxes[cands]  # (H, W, 2, 5)
    iou = rotated_iou(
        jnp.broadcast_to(anchors[:, :, :, None, :], (h, w, k, _CANDS, 5)),
        jnp.broadcast_to(cand_boxes[:, :, None, :, :], (h, w, k, _CANDS, 5)),
    )  # (H, W, K, 2)
    iou = iou * cand_valid[:, :, None, :].astype(dtype)

    best_c = jnp.argmax(iou, axis=-1)  # (H, W, K) in {0, 1}
    best_iou = jnp.take_along_axis(iou, best_c[..., None], axis=-1)[..., 0]
    best_gt = jnp.take_along_axis(
        jnp.broadcast_to(cands[:, :, None, :], (h, w, k, _CANDS)),
        best_c[..., None],
        axis=-1,
    )[..., 0]

    # ---- 3. force each GT's best anchor positive ---------------------- #
    # Best anchor of GT m: the best-IoU anchor shape at the GT's own cell.
    grid = config.grid
    (x0, _), (y0, _) = grid.area_extents[0], grid.area_extents[1]
    gr = jnp.clip(
        jnp.floor((gt_boxes[:, 0] - x0) / grid.voxel_size[0]).astype(jnp.int32),
        0,
        h - 1,
    )
    gc = jnp.clip(
        jnp.floor((gt_boxes[:, 1] - y0) / grid.voxel_size[1]).astype(jnp.int32),
        0,
        w - 1,
    )
    own_anchors = anchors[gr, gc]  # (M, K, 5)
    own_iou = rotated_iou(
        jnp.broadcast_to(gt_boxes[:, None, :], (m, k, 5)), own_anchors
    )  # (M, K)
    own_k = jnp.argmax(own_iou, axis=-1)  # (M,)
    force = gt_mask & (jnp.max(own_iou, axis=-1) > 0.0)
    flat_idx = jnp.where(force, (gr * w + gc) * k + own_k, h * w * k)
    forced_iou = (
        jnp.zeros((h * w * k,), dtype)
        .at[flat_idx]
        .max(jnp.where(force, pos_thr + 1e-3, 0.0), mode="drop")
        .reshape(h, w, k)
    )
    forced_gt = (
        jnp.full((h * w * k,), -1, jnp.int32)
        .at[flat_idx]
        .max(jnp.where(force, jnp.arange(m), -1), mode="drop")
        .reshape(h, w, k)
    )
    take_forced = forced_iou > best_iou
    best_iou = jnp.where(take_forced, forced_iou, best_iou)
    best_gt = jnp.where(take_forced, forced_gt, best_gt)

    # ---- 4. labels + regression targets ------------------------------- #
    pos = best_iou >= pos_thr
    neg = best_iou < neg_thr
    labels = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
    # Encode non-positive cells against their own anchor (exact zeros) so
    # degenerate padded GT never reaches the log() in the codec.
    matched = jnp.where(pos[..., None], gt_boxes[best_gt], anchors)
    reg = encode_boxes(matched, anchors)
    reg_mask = pos.astype(dtype)
    reg = reg * reg_mask[..., None]
    return AnchorTargets(labels, reg, reg_mask, best_iou)
