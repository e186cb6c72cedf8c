"""GT -> anchor target assignment.

Analog of the reference's anchor assignment († coperception/utils/obj_util.py,
SURVEY.md §2.1): IoU-match GT boxes to the dense anchor grid, producing
classification labels, encoded regression targets, and the regression loss
mask.

TPU-first design: instead of an all-pairs (H*W*K x M) shapely loop on host,
we exploit locality — a GT box can only overlap anchors within a small
window around its center — and `lax.scan` over a *static* max-GT axis,
updating a dense best-IoU map through windowed dynamic slices. This runs
on-device inside the streaming input pipeline, or on CPU in offline
preprocessing, from the same jitted code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.ops.boxes import encode_boxes
from v2x_sim_tpu.ops.iou_sh import rotated_iou

#: Side length (cells) of the local anchor window examined per GT box.
#: Covers boxes with (gt_diag + anchor_diag)/2 up to WIN/2 * voxel cells.
WIN = 48


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
    grid = config.grid
    pos_thr = config.anchors.pos_iou_threshold
    neg_thr = config.anchors.neg_iou_threshold

    win = min(WIN, h, w)

    def window_start(gt):
        """Top-left cell of the WIN x WIN window centered on a GT box."""
        (x0, _), (y0, _) = grid.area_extents[0], grid.area_extents[1]
        r = jnp.floor((gt[0] - x0) / grid.voxel_size[0]).astype(jnp.int32)
        c = jnp.floor((gt[1] - y0) / grid.voxel_size[1]).astype(jnp.int32)
        r0 = jnp.clip(r - win // 2, 0, h - win)
        c0 = jnp.clip(c - win // 2, 0, w - win)
        return r0, c0

    def body(state, inp):
        best_iou, best_gt = state
        gt, valid, gt_idx = inp
        r0, c0 = window_start(gt)
        anc_w = jax.lax.dynamic_slice(anchors, (r0, c0, 0, 0), (win, win, k, 5))
        iou_w = rotated_iou(
            jnp.broadcast_to(gt, (win, win, k, 5)), anc_w
        ) * valid.astype(anchors.dtype)
        # Force the best-matching anchor of each GT positive (>= pos_thr),
        # so no GT is unlearnable. Standard practice; the reference achieves
        # similar coverage via its gt_max_iou bookkeeping.
        flat = iou_w.reshape(-1)
        amax = jnp.argmax(flat)
        bump = jnp.zeros_like(flat).at[amax].set(
            jnp.where(valid & (flat[amax] > 0.0), pos_thr + 1e-3, 0.0)
        )
        iou_w = jnp.maximum(iou_w, bump.reshape(iou_w.shape))

        cur_iou = jax.lax.dynamic_slice(best_iou, (r0, c0, 0), (win, win, k))
        cur_gt = jax.lax.dynamic_slice(best_gt, (r0, c0, 0), (win, win, k))
        take = iou_w > cur_iou
        new_iou = jnp.where(take, iou_w, cur_iou)
        new_gt = jnp.where(take, gt_idx, cur_gt)
        best_iou = jax.lax.dynamic_update_slice(best_iou, new_iou, (r0, c0, 0))
        best_gt = jax.lax.dynamic_update_slice(best_gt, new_gt, (r0, c0, 0))
        return (best_iou, best_gt), None

    # Derive zero-valued carries from the (possibly device-varying) GT
    # inputs so the scan carry has the same varying-manual-axes type as
    # its updates under shard_map (jax vma rule); XLA folds the no-op.
    vzero_f = (gt_boxes[0, 0] * 0).astype(anchors.dtype)
    vzero_i = (gt_mask[0] * 0).astype(jnp.int32)
    init = (
        jnp.zeros((h, w, k), dtype=anchors.dtype) + vzero_f,
        jnp.full((h, w, k), -1, dtype=jnp.int32) + vzero_i,
    )
    (best_iou, best_gt), _ = jax.lax.scan(
        body, init, (gt_boxes, gt_mask, jnp.arange(m, dtype=jnp.int32))
    )

    pos = best_iou >= pos_thr
    neg = best_iou < neg_thr
    labels = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
    matched = gt_boxes[jnp.clip(best_gt, 0, m - 1)]  # (H, W, K, 5)
    reg = encode_boxes(matched, anchors)
    reg_mask = pos.astype(anchors.dtype)
    reg = reg * reg_mask[..., None]
    return AnchorTargets(labels, reg, reg_mask, best_iou)
