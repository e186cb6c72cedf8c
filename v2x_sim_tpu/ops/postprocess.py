"""Prediction decoding and cross-agent late fusion.

Analog of † coperception/utils/postprocess.py + detection_util.py
(SURVEY.md §2.1): logits -> scores, delta decode vs anchors, rotated NMS,
plus the late-fusion mode of the reference's test tool (merge per-agent
boxes into each ego frame and re-suppress). Shared by the task module's
predict path and the CLI tools; everything static-shape and on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from v2x_sim_tpu.ops.boxes import decode_boxes
from v2x_sim_tpu.ops.nms import NMSResult, batched_nms


def _peak_filter(diff_full: jnp.ndarray, window: int) -> jnp.ndarray:
    """Keep only spatial local maxima of the score map; everything else
    drops to -inf so top-K never selects it.

    diff_full: (N, H, W, K) foreground-logit differences. A cell-anchor
    survives iff its score equals the max over the `window`x`window`
    spatial neighborhood across ALL K anchor lanes — i.e. at most one
    candidate per local score peak (CenterNet-style max-pool NMS, here
    as the pre-top-K stage).

    Why this exists: at production geometry (0.25 m voxels) one vehicle
    saturates ~80 positive anchors. A global top-K over raw scores fills
    with duplicates of the few highest-scoring vehicles, and NMS then
    collapses them to ~1 box — the oracle probe (decode the training
    targets themselves) measured mAP@0.5 = 0.15 at K=16 vs 0.88 at
    K=512 from exactly this (docs/UPPERBOUND_DIAGNOSIS.md). The
    reference never truncates pre-NMS (its postprocess keeps every
    above-threshold box, † coperception/utils/postprocess.py), so K=16
    silently deviated from it at fine grids. Peak filtering restores
    ~1 candidate/vehicle, making a small static K faithful again —
    one reduce_window max + compare, VPU-friendly, no dynamic shapes.
    """
    cell_max = jnp.max(diff_full, axis=-1, keepdims=True)
    pooled = jax.lax.reduce_window(
        cell_max,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return jnp.where(diff_full >= pooled, diff_full, -jnp.inf)


def decode_topk(
    cls_logits: jnp.ndarray,
    reg: jnp.ndarray,
    anchors: jnp.ndarray,
    k: int,
    score_threshold: float,
    agent_mask: jnp.ndarray,
    exact: bool = False,
    peak_window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K score selection + box decode.

    Args:
      cls_logits: (B, A, H, W, K_anchor, C).
      reg: (B, A, H, W, K_anchor, 6).
      anchors: (H, W, K_anchor, 5) dense anchor grid.
      k: candidates kept per agent.
      score_threshold: validity cutoff on the foreground probability.
      agent_mask: (B, A).
      exact: use exact top_k (a full sort on TPU) instead of the
        hardware-accelerated `approx_max_k` (recall ~0.99; downstream NMS
        + the score threshold make the difference unmeasurable in mAP).
      peak_window: if > 0, keep only spatial local maxima of the score
        map before top-K (see _peak_filter) — required at fine voxel
        grids where one object saturates many anchors.

    Returns:
      boxes (B, A, k, 5), scores (B, A, k), valid (B, A, k).
    """
    b, a = cls_logits.shape[:2]
    h, w, kk = anchors.shape[:3]
    nc = cls_logits.shape[-1]
    code = reg.shape[-1]
    # Work on the heads' natural flat conv layout (B*A, H, W, K*C): the
    # 6-D (..., K, C) view has tiny minor dims that XLA materializes in a
    # ~20x-padded tiled layout the moment it crosses a fusion boundary.
    # reshape-of-reshape collapses back to the conv output, so nothing
    # padded is ever written.
    cls_flat = cls_logits.reshape(b * a, h, w, kk * nc)
    reg_flat = reg.reshape(b * a, h, w, kk * code)
    # Binary softmax == sigmoid of the logit difference; rank on the raw
    # difference and sigmoid only the k survivors (saves a full-grid
    # softmax over ~10M logits).
    diff = cls_flat[..., 1::nc] - cls_flat[..., 0::nc]  # (BA, H, W, K)
    if peak_window:
        diff = _peak_filter(diff, peak_window)
    diff = diff.reshape(b * a, -1)
    flat_anchors = anchors.reshape(-1, 5)

    if exact:
        top_diff, top_idx = jax.lax.top_k(diff, k)
    else:
        top_diff, top_idx = jax.lax.approx_max_k(
            diff, k, recall_target=0.99
        )
    top_scores = jax.nn.sigmoid(top_diff.astype(jnp.float32)).reshape(b, a, k)
    # Gather the k survivors' reg codes from the flat map via decomposed
    # indices: rows (y, x) first, then the anchor's `code` lanes.
    hi = top_idx // (w * kk)
    rem = top_idx % (w * kk)
    wi, ki = rem // kk, rem % kk
    rows = jax.vmap(lambda r, y, x: r[y, x])(reg_flat, hi, wi)  # (BA, k, K*code)
    lanes = ki[..., None] * code + jnp.arange(code)
    top_codes = (
        jnp.take_along_axis(rows, lanes, axis=-1)
        .reshape(b, a, k, code)
        .astype(jnp.float32)
    )
    # The anchor grid is shared across (B, A): gather the (HWK, 5) table
    # directly rather than broadcasting it across the batch.
    top_anchors = jnp.take(flat_anchors, top_idx, axis=0).reshape(b, a, k, 5)
    boxes = decode_boxes(top_codes, top_anchors)
    valid = (top_scores > score_threshold) & agent_mask[..., None]
    return boxes, top_scores, valid




def _topk_blocked(cls_blk, k, exact, peak_window=0):
    """Shared front half of the blocked decoders: rank the binary logit
    difference over the blocked map, sigmoid the K survivors, and
    decompose each flat index into (blocked cell, phase-major anchor pk,
    phase p, anchor ki) plus full-res cell coordinates (hi, wi).

    cls_blk: (B, A, H/2, W/2, 4*K_anchor, C). One implementation — a
    phase-decomposition fix applies to the eager and lazy decoders alike.
    """
    b, a, h2, w2, k4, nc = cls_blk.shape
    kk = k4 // 4
    cls_flat = cls_blk.reshape(b * a, h2, w2, k4 * nc)
    diff = cls_flat[..., 1::nc] - cls_flat[..., 0::nc]  # (BA, h2, w2, 4K)
    if peak_window:
        # The spatial neighborhood lives at full resolution: un-block,
        # filter, re-block (two free relayouts vs the 453 MB reg map the
        # blocked path exists to avoid — diff is one f32 lane per anchor).
        from v2x_sim_tpu.models.s2d import depth_to_space, space_to_depth

        diff = space_to_depth(
            _peak_filter(depth_to_space(diff), peak_window)
        )
    diff = diff.reshape(b * a, -1)
    if exact:
        top_diff, top_idx = jax.lax.top_k(diff, k)
    else:
        top_diff, top_idx = jax.lax.approx_max_k(diff, k, recall_target=0.99)
    top_scores = jax.nn.sigmoid(top_diff.astype(jnp.float32)).reshape(b, a, k)
    cell = top_idx // k4  # blocked cell = hi2 * w2 + wi2
    pk = top_idx % k4  # phase-major anchor index = p * K + k
    p, ki = pk // kk, pk % kk
    hi = 2 * (cell // w2) + p // 2
    wi = 2 * (cell % w2) + p % 2
    return top_scores, cell, pk, p, ki, hi, wi


def _onehot_rows(flat, cell):
    """Row fetch at the top cells as a one-hot MXU matmul (the
    iota-compare fuses into the dot operand): ~10x a take_along_axis row
    gather on TPU at these shapes. flat: (n, R, C), cell: (n, k)."""
    sel = (cell[:, :, None] == jnp.arange(flat.shape[1])[None, None, :]).astype(
        flat.dtype
    )
    return jnp.einsum("nkr,nrc->nkc", sel, flat)


def _analytic_anchors(config, hi, wi, ki, shape):
    """Anchors rebuilt from the decoded cell index — the grid is regular,
    so no (H*W*K, 5) table gather: centers analytically, (l, w, yaw) via
    a tiny one-hot contraction against the K-row anchor table."""
    import numpy as np

    b, a, k = shape
    g = config.grid
    cx = g.lower[0] + (hi.astype(jnp.float32) + 0.5) * g.voxel_size[0]
    cy = g.lower[1] + (wi.astype(jnp.float32) + 0.5) * g.voxel_size[1]
    table = jnp.asarray(np.asarray(config.anchors.sizes, np.float32))
    ksel = (ki[..., None] == jnp.arange(table.shape[0])).astype(jnp.float32)
    lwy = jnp.einsum("nki,ic->nkc", ksel, table)
    return jnp.concatenate(
        [cx[..., None], cy[..., None], lwy], axis=-1
    ).reshape(b, a, k, 5)


def decode_topk_blocked(
    cls_blk: jnp.ndarray,
    reg_blk: jnp.ndarray,
    config,
    k: int,
    score_threshold: float,
    agent_mask: jnp.ndarray,
    exact: bool = False,
    peak_window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`decode_topk` on space-to-depth (blocked) head outputs.

    Consumes the training-layout heads directly — (B, A, H/2, W/2, 4*K,
    C) with anchor index p*K + k for 2x2 phase p (models.s2d) — so the
    predict path never pays the depth_to_space transpose of the two
    full-res head maps (~600 MB of tiny-minor-dim tensors per production
    batch). Anchors are reconstructed analytically from the decoded cell
    index (the grid is regular), which also drops the (H*W*K, 5) anchor
    table gather. Returns exactly `decode_topk`'s contract.

    Args:
      cls_blk: (B, A, H/2, W/2, 4*K_anchor, C) blocked class logits.
      reg_blk: (B, A, H/2, W/2, 4*K_anchor, code) blocked reg deltas.
      config: static Config (grid geometry + anchor table).
    """
    b, a, h2, w2, k4, nc = cls_blk.shape
    kk = k4 // 4
    code = reg_blk.shape[-1]
    reg_flat = reg_blk.reshape(b * a, h2 * w2, k4 * code)
    top_scores, cell, pk, _, ki, hi, wi = _topk_blocked(
        cls_blk, k, exact, peak_window
    )

    rows = _onehot_rows(reg_flat, cell)
    # Lane select as a one-hot contraction (take_along_axis gathers are
    # VMEM-read-bound here — see decode_topk_blocked_lazy).
    psel = (pk[..., None] == jnp.arange(k4)).astype(rows.dtype)
    top_codes = (
        jnp.einsum("nkp,nkpc->nkc", psel, rows.reshape(b * a, k, k4, code))
        .reshape(b, a, k, code)
        .astype(jnp.float32)
    )

    top_anchors = _analytic_anchors(config, hi, wi, ki, (b, a, k))
    boxes = decode_boxes(top_codes, top_anchors)
    valid = (top_scores > score_threshold) & agent_mask[..., None]
    return boxes, top_scores, valid


def decode_topk_blocked_lazy(
    cls_blk: jnp.ndarray,
    reg_hidden_blk: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    config,
    k: int,
    score_threshold: float,
    agent_mask: jnp.ndarray,
    exact: bool = False,
    peak_window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`decode_topk_blocked` with a LAZY regression head.

    Takes the reg head's blocked hidden map (B, A, H/2, W/2, 4*HID) —
    models.backbone.RegressionHead(lazy=True) — plus the head's final 1x1
    conv params (w1: (1, 1, HID, K*code), b1: (K*code,)), and evaluates
    that conv only at the top-K cells. The full-res reg map (453 MB at
    production geometry) plus the relayout copies its flat decode view
    cost (~2.8 ms measured, docs/PERF.md) never materialize.

    The 1x1 conv on blocked input is a per-phase matmul with the SAME
    (HID, K*code) matrix (models.s2d.S2DConv1x1), so gathering the top
    cell's phase lane group and right-multiplying reproduces the full
    conv output at that anchor exactly.
    """
    b, a, h2, w2, hid4 = cls_blk.shape[:2] + reg_hidden_blk.shape[2:]
    kk = cls_blk.shape[-2] // 4
    hid = hid4 // 4
    code = int(b1.shape[-1]) // kk
    n = b * a
    hid_flat = reg_hidden_blk.reshape(n, h2 * w2, hid4)
    top_scores, cell, pk, p, ki, hi, wi = _topk_blocked(
        cls_blk, k, exact, peak_window
    )

    rows = _onehot_rows(hid_flat, cell)  # (n, k, 4*HID)
    # Select the 2x2 phase group and the anchor's code lanes via one-hot
    # contractions — NOT take_along_axis, whose gather lowering here is
    # VMEM-read-bound (measured 4.7 ms for 786 KB of output on v5e).
    psel = (p[..., None] == jnp.arange(4)).astype(hid_flat.dtype)
    rows_p = jnp.einsum(
        "nkp,nkph->nkh", psel, rows.reshape(n, k, 4, hid)
    )  # (n, k, HID)
    w1m = w1.reshape(hid, kk * code).astype(rows_p.dtype)
    codes_all = rows_p @ w1m + b1.astype(rows_p.dtype)  # (n, k, K*code)
    ksel_c = (ki[..., None] == jnp.arange(kk)).astype(codes_all.dtype)
    top_codes = (
        jnp.einsum("nki,nkic->nkc", ksel_c, codes_all.reshape(n, k, kk, code))
        .reshape(b, a, k, code)
        .astype(jnp.float32)
    )

    top_anchors = _analytic_anchors(config, hi, wi, ki, (b, a, k))
    boxes = decode_boxes(top_codes, top_anchors)
    valid = (top_scores > score_threshold) & agent_mask[..., None]
    return boxes, top_scores, valid


def transform_boxes(boxes: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid 4x4 transform to (..., 5) BEV boxes.

    Centers move through the full transform; yaw shifts by the
    transform's planar rotation angle; sizes are invariant.
    """
    x, y = boxes[..., 0], boxes[..., 1]
    nx = t[..., 0, 0] * x + t[..., 0, 1] * y + t[..., 0, 3]
    ny = t[..., 1, 0] * x + t[..., 1, 1] * y + t[..., 1, 3]
    dyaw = jnp.arctan2(t[..., 1, 0], t[..., 0, 0])
    return jnp.stack(
        [nx, ny, boxes[..., 2], boxes[..., 3], boxes[..., 4] + dyaw], axis=-1
    )


def late_fuse(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    trans: jnp.ndarray,
    agent_mask: jnp.ndarray,
    nms_iou: float = 0.1,
    max_out: int = 0,
) -> NMSResult:
    """Late fusion: merge every agent's detections into each ego frame.

    The reference's test-time late-fusion mode (SURVEY.md §2.2
    test_codet): per ego agent i, transform all agents' boxes through
    T_{i<-j}, pool them, and run one NMS over the union.

    Args:
      boxes/scores/valid: (B, A, K, ...) per-agent detections (each in
        its own frame).
      trans: (B, A, A, 4, 4), trans[b, i, j] = T_{i<-j}.
      agent_mask: (B, A).
      nms_iou: suppression threshold for the merged set.
      max_out: keep this many top candidates per ego before NMS
        (0 = A*K, no truncation).

    Returns:
      NMSResult with (B, A, max_out or A*K) merged, suppressed boxes per
      ego agent.
    """
    b, a, k, _ = boxes.shape
    # moved[b, i, j, k] = box k of agent j expressed in agent i's frame.
    moved = transform_boxes(
        jnp.broadcast_to(boxes[:, None], (b, a, a, k, 5)),
        trans[:, :, :, None],
    )
    merged = moved.reshape(b, a, a * k, 5)
    src_ok = (valid & agent_mask[:, :, None])[:, None, :, :]
    merged_valid = jnp.broadcast_to(src_ok, (b, a, a, k)).reshape(b, a, a * k)
    merged_scores = jnp.broadcast_to(
        scores[:, None], (b, a, a, k)
    ).reshape(b, a, a * k)

    if max_out and max_out < a * k:
        sel_scores, sel_idx = jax.lax.top_k(
            jnp.where(merged_valid, merged_scores, -jnp.inf), max_out
        )
        merged = jnp.take_along_axis(merged, sel_idx[..., None], axis=2)
        merged_valid = jnp.take_along_axis(merged_valid, sel_idx, axis=2)
        merged_scores = sel_scores
    return batched_nms(merged, merged_scores, merged_valid, nms_iou)
