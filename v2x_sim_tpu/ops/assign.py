"""GT -> anchor target assignment.

Analog of the reference's anchor assignment († coperception/utils/obj_util.py,
SURVEY.md §2.1): IoU-match GT boxes to the dense anchor grid, producing
classification labels, encoded regression targets, and the regression loss
mask.

TPU-first design — dense, regular, gather-free, natively batched:
  1. Every BEV cell ranks the (static, padded) GT set by center distance
     and keeps its top-2 candidates — one (B, H, W, M) elementwise pass +
     two masked argmins, no sort.
  2. Exact rotated IoU runs densely against just those 2 candidates per
     (cell, anchor) — ONE Pallas kernel launch over all B*H*W*K pairs per
     candidate (vmapping the per-sample function instead serializes ~100
     kernel launches per batch).
  3. Each GT's single best anchor is forced positive through one tiny
     B*M-element scatter-max, so no GT is unlearnable.

Layout rules learned the hard way (each violation cost GBs of padded HBM
or a 10x slowdown at production geometry):
  * Everything between the candidate selection and the final reshape works
    on FLAT (B, n = H*W*K) arrays: any big tensor with tiny minor dims
    (..., K, 5) materializes in a 20-85x padded tiled layout.
  * Row lookups from the tiny (M, 5) GT table are one-hot matmuls on the
    MXU, never gathers (a 19M-row gather is ~10x slower).

Two earlier designs (scan+dynamic_update_slice windows; vmapped
dynamic_slice windows + a 10M-element packed scatter) compiled
pathologically on TPU. Top-2-by-distance is exact for the benchmark's box
statistics (vehicles whose footprints overlap a cell's anchor essentially
never have 3+ centers closer than a third box's); tests assert parity
with a brute-force all-pairs oracle.

Runs on-device inside the streaming input pipeline (prepare_batch), or on
CPU in offline preprocessing, from the same jitted code.
"""

from __future__ import annotations

import functools
from typing import Literal, NamedTuple, Union

import jax
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.ops.iou_sh import (
    rotated_iou_auto as rotated_iou,
    rotated_iou_pairs_soa_periodic_auto,
)

#: Padded positive-cell capacity of the sparse assignment output
#: (assign_targets_batched(flat="sparse")) at coarse grids, where a GT
#: vehicle covers a handful of cells.
_SPARSE_CELLS = 256

#: Fine-grid capacity. At 0.25 m voxels a 4.5x1.9 m vehicle has
#: IoU >= 0.4 anchors over a ~15x7-cell neighborhood (~90-100 positive
#: cells per GT; measured 210-672 per agent-scene with 4-12 GT at the
#: production grid), so 256 truncated MOST positives: the overflowed
#: anchors kept their positive cls labels with NO regression target,
#: trained to score ~1 while regressing garbage, and flooded the
#: decode's top-K — the round-4 production-table mAP ceiling and the
#: upperbound-inversion oscillation (docs/UPPERBOUND_DIAGNOSIS.md).
_SPARSE_CELLS_FINE = 1024


def sparse_cell_capacity(config: Config) -> int:
    """Positive-cell capacity of the sparse target layout for `config`'s
    grid. Any positive cell beyond capacity is DEMOTED to ignore (-1) in
    the cls labels — an unsupervised positive is poison (see
    _SPARSE_CELLS_FINE); an ignored one just forgoes a little signal."""
    vx = float(config.grid.voxel_size[0])
    cap = _SPARSE_CELLS if vx >= 1.0 else _SPARSE_CELLS_FINE
    h, w = config.grid.bev_shape
    return min(cap, h * w)


def target_fingerprint(config: Config) -> int:
    """CRC32 of everything the baked-target semantics depend on.

    Stored in the cache's tgt_meta (create_data_det --targets 1) and
    checked by tools.common.strip_stale_targets: the grid shape alone is
    not enough — an anchor-size/rotation or assignment-threshold change
    that preserves (H, W, K) would otherwise silently train against
    stale targets. Hashes the realized anchor grid values (covers sizes,
    rotations, and cell placement) plus the assignment thresholds and
    box codec width."""
    import zlib

    import numpy as np

    from v2x_sim_tpu.ops.anchors import anchor_grid

    a = config.anchors
    payload = np.ascontiguousarray(
        anchor_grid(config), dtype=np.float32
    ).tobytes() + np.asarray(
        [a.pos_iou_threshold, a.neg_iou_threshold, float(a.box_code_size)],
        np.float32,
    ).tobytes() + np.asarray(
        # Sparse-layout semantics: the positive-cell capacity and the
        # round-5 demote-overflow-to-ignore invariant both change what
        # baked labels MEAN — caches baked under the old semantics must
        # be detected as stale. The trailing constant is a semantics
        # version, bumped with any such behavioral change.
        [float(sparse_cell_capacity(config)), 2.0],
        np.float32,
    ).tobytes()
    return zlib.crc32(payload) & 0x7FFFFFFF  # int32-safe


class SparseTargets(NamedTuple):
    """Sparse positive-anchor training targets (assign_targets_sparse).

    labels: (B, n) int8 — dense flat classification labels (1/0/-1).
    cells: (B, Pc) int32 — BEV cells holding positives (top-k padded).
    wts: (B, Pc*K) float32 — 1.0 where that cell-anchor is positive.
    reg: (B, Pc*K, code) float32 — encoded deltas at those anchors.
    """

    labels: jnp.ndarray
    cells: jnp.ndarray
    wts: jnp.ndarray
    reg: jnp.ndarray
    #: (B,) int32 — positive cells beyond the _SPARSE_CELLS capacity whose
    #: localization targets were dropped (their cls labels stay positive).
    #: Scenes peak at ~100 positives so this is 0 in practice; consumers
    #: that care (debug paths, tests) can assert it is zero.
    overflow: jnp.ndarray


class AnchorTargets(NamedTuple):
    """Dense per-anchor training targets.

    labels: (..., H, W, K) int32 — 1 positive, 0 negative, -1 ignore.
    reg_targets: (..., H, W, K, 6) float32 — encoded box deltas (zero where
      not positive).
    reg_mask: (..., H, W, K) float32 — 1.0 where regression loss applies.
    best_iou: (..., H, W, K) float32 — max IoU of each anchor vs any GT.
    """

    labels: jnp.ndarray
    reg_targets: jnp.ndarray
    reg_mask: jnp.ndarray
    best_iou: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("config", "flat"))
def assign_targets_batched(
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors: jnp.ndarray,
    config: Config,
    flat: Union[bool, Literal["sparse"]] = False,
) -> "AnchorTargets | SparseTargets":
    """Assign GT boxes to anchors for a whole batch at once.

    Args:
      gt_boxes: (B, M, 5) padded GT (x, y, l, w, yaw).
      gt_mask: (B, M) bool validity.
      anchors: (H, W, K, 5) dense anchor grid (see ops.anchors.anchor_grid).
      config: static config (thresholds, grid geometry).
      flat: output layout — False ("dense"): AnchorTargets over the full
        (B, H, W, K) grid; True ("flat"): AnchorTargets with flat (B, n)
        labels and structure-of-arrays (B, 6, n) regression targets;
        "sparse": SparseTargets with localization targets only at the
        top-_SPARSE_CELLS positive cells (the training path's layout).

    Returns:
      AnchorTargets (flat in {False, True}) or SparseTargets ("sparse").
    """
    h, w, k, _ = anchors.shape
    b, m = gt_boxes.shape[:2]
    pos_thr = config.anchors.pos_iou_threshold
    neg_thr = config.anchors.neg_iou_threshold
    dtype = anchors.dtype
    n = h * w * k
    # The SoA lookup and the periodic Pallas IoU operands are pre-tiled
    # to (rows, 128) lanes; fail loudly on grids that don't tile instead
    # of dying inside jit with an opaque reshape error.
    assert n % 128 == 0, (
        f"H*W*K = {h}*{w}*{k} = {n} must be a multiple of 128 "
        "(pick a BEV grid whose cell count times num_anchors tiles into "
        "128-wide lanes)"
    )
    anchors_flat = anchors.reshape(n, 5)

    # ---- 1. top-2 GT candidates per cell by center distance ---------- #
    cell_x = anchors[:, :, 0, 0]  # (H, W): anchor centers == cell centers
    cell_y = anchors[:, :, 0, 1]
    dx = cell_x[None, :, :, None] - gt_boxes[:, None, None, :, 0]
    dy = cell_y[None, :, :, None] - gt_boxes[:, None, None, :, 1]
    d2 = dx * dx + dy * dy  # (B, H, W, M)
    d2 = jnp.where(gt_mask[:, None, None, :], d2, jnp.inf)

    c1 = jnp.argmin(d2, axis=-1)  # (B, H, W)
    oh1 = jax.nn.one_hot(c1, m, dtype=bool)
    d2_wo1 = jnp.where(oh1, jnp.inf, d2)
    c2 = jnp.argmin(d2_wo1, axis=-1)
    # Candidate validity via one-hot reductions (a take_along_axis gather
    # here costs ~100 ms at production batch).
    gm = gt_mask.astype(dtype)
    cv1 = jnp.einsum("bhwm,bm->bhw", oh1.astype(dtype), gm)
    cv2 = jnp.einsum(
        "bhwm,bm->bhw", jax.nn.one_hot(c2, m, dtype=dtype), gm
    )

    # ---- 2. exact IoU vs candidates (flat) ---------------------------- #
    c1f = jnp.broadcast_to(c1[..., None], (b, h, w, k)).reshape(b, n)
    c2f = jnp.broadcast_to(c2[..., None], (b, h, w, k)).reshape(b, n)
    v1 = jnp.broadcast_to(cv1[..., None], (b, h, w, k)).reshape(b, n)
    v2 = jnp.broadcast_to(cv2[..., None], (b, h, w, k)).reshape(b, n)
    lookup = lambda idx: jnp.einsum(
        "bnm,bmf->bnf", jax.nn.one_hot(idx, m, dtype=dtype), gt_boxes
    )

    # Field-major (5, B*n) IoU operands — the Pallas kernel's native
    # layout; (B, n, 5)-shaped operands paid a ~10 ms relayout each at
    # this scale. One einsum per field keeps the one-hot fused into the
    # dot (a materialized (B, n, M) one-hot would be 4.8 GB), and the
    # einsums run on a pre-tiled (B, n/128, 128) view so their outputs
    # already sit in the kernel's (rows, 128) tiling — a flat (B, n)
    # output relayouts ~2 ms per field into the kernel operand.
    def lookup_soa(idx):
        idxt = idx.reshape(b, n // 128, 128)
        oh = jax.nn.one_hot(idxt, m, dtype=dtype)
        return jnp.stack(
            [
                jnp.einsum("brlm,bm->brl", oh, gt_boxes[..., f]).reshape(
                    -1, 128
                )
                for f in range(5)
            ],
            axis=0,
        ).reshape(5, b * n)

    anchors_soa = anchors_flat.T  # (5, n) — tiled by the kernel
    iou1 = rotated_iou_pairs_soa_periodic_auto(
        anchors_soa, lookup_soa(c1f)
    ).reshape(b, n) * v1.astype(dtype)
    iou2 = rotated_iou_pairs_soa_periodic_auto(
        anchors_soa, lookup_soa(c2f)
    ).reshape(b, n) * v2.astype(dtype)

    take2 = iou2 > iou1
    best_iou = jnp.where(take2, iou2, iou1)  # (B, n)
    best_gt = jnp.where(take2, c2f, c1f)  # (B, n)

    # ---- 3. force each GT's best anchor positive ---------------------- #
    # Best anchor of GT j: the best-IoU anchor shape at the GT's own cell.
    grid = config.grid
    (x0, _), (y0, _) = grid.area_extents[0], grid.area_extents[1]
    gr = jnp.clip(
        jnp.floor(
            (gt_boxes[..., 0] - x0) / grid.voxel_size[0]
        ).astype(jnp.int32),
        0,
        h - 1,
    )  # (B, M)
    gc = jnp.clip(
        jnp.floor(
            (gt_boxes[..., 1] - y0) / grid.voxel_size[1]
        ).astype(jnp.int32),
        0,
        w - 1,
    )
    own_anchors = anchors[gr, gc]  # (B, M, K, 5) — tiny gather
    own_iou = rotated_iou(
        jnp.broadcast_to(gt_boxes[:, :, None, :], (b, m, k, 5)), own_anchors
    )  # (B, M, K)
    own_k = jnp.argmax(own_iou, axis=-1)  # (B, M)
    force = gt_mask & (jnp.max(own_iou, axis=-1) > 0.0)
    # Anchor-side membership test, fused compare + reduce over the tiny
    # GT axis: "is anchor n the forced best anchor of some GT?". The
    # earlier full-grid scatter formulation materialized two (B, n+1)
    # maps through dynamic-update-slice (~8 ms for 3k updates).
    forced_anchor = jnp.where(force, (gr * w + gc) * k + own_k, -1)  # (B, M)
    anchor_ids = jnp.arange(n, dtype=jnp.int32)
    eq = anchor_ids[None, :, None] == forced_anchor[:, None, :]  # (B, n, M)
    # Forcing only upgrades anchors that are NOT already positive for
    # some GT (strictly below pos_thr): an anchor genuinely positive for
    # another GT keeps its own match — the earlier `< pos_thr + 1e-3`
    # window could flip such an anchor's regression target to the
    # forcing GT despite a larger overlap with its matched one.
    take_forced = jnp.any(eq, axis=-1) & (best_iou < pos_thr)
    forced_gt = jnp.max(
        jnp.where(eq, jnp.arange(m, dtype=jnp.int32)[None, None, :], -1),
        axis=-1,
    )
    # Lift exactly to pos_thr so the positive test below fires; the true
    # anchor-vs-GT IoU of a forced anchor is below that by construction.
    best_iou = jnp.where(take_forced, pos_thr, best_iou)
    best_gt = jnp.where(take_forced, forced_gt, best_gt)

    # ---- 4. labels + regression targets (still flat) ------------------ #
    pos = best_iou >= pos_thr
    neg = best_iou < neg_thr
    labels = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
    reg_mask = pos.astype(dtype)
    if flat == "sparse":
        # SPARSE localization targets: the dense (B, n, 6) encode costs
        # ~1 GB of writes plus a pathological fetch (gathers read it at
        # 58 GiB/s; one-hot dots pad N to 128); instead pick the
        # positive cells here and encode ONLY their K anchors (tiny
        # vector math). Pc = _SPARSE_CELLS.
        pc = sparse_cell_capacity(config)
        hw = h * w
        cell_any = jax.lax.reduce_window(
            reg_mask,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, k),
            window_strides=(1, k),
            padding="VALID",
        )  # (B, HW)
        _, cells = jax.lax.top_k(cell_any, pc)
        lanes = (cells[..., None] * k + jnp.arange(k)).reshape(b, pc * k)
        wts = jnp.take_along_axis(reg_mask, lanes, axis=-1)
        bg = jnp.take_along_axis(best_gt, lanes, axis=-1)
        matched_sp = jnp.einsum(
            "bpm,bmf->bpf",
            jax.nn.one_hot(bg, m, dtype=dtype),
            gt_boxes,
        )  # (B, P, 5)
        # Analytic anchor parameters (regular grid + per-k size table,
        # same reconstruction as ops.postprocess.decode_topk_blocked).
        hh = (lanes // k) // w
        ww = (lanes // k) % w
        sax = x0 + (hh.astype(dtype) + 0.5) * grid.voxel_size[0]
        say = y0 + (ww.astype(dtype) + 0.5) * grid.voxel_size[1]
        import numpy as _np

        table = jnp.asarray(_np.asarray(config.anchors.sizes, _np.float32))
        ksel = jax.nn.one_hot(lanes % k, k, dtype=dtype)
        lwy = jnp.einsum("bpk,kf->bpf", ksel, table)
        sal, saw = lwy[..., 0], lwy[..., 1]
        # Non-positive lanes encode against their own anchor (exact zeros
        # for the translation/size fields, so padded GT never reaches the
        # codec's log). Tiny (B, P, 6) tensors: the shared AoS codec is
        # fine here — the SoA inline encode below is for the (B, n) dense
        # path only.
        from v2x_sim_tpu.ops.boxes import encode_boxes

        sgt = jnp.stack(
            [
                jnp.where(wts > 0, matched_sp[..., 0], sax),
                jnp.where(wts > 0, matched_sp[..., 1], say),
                jnp.where(wts > 0, matched_sp[..., 2], sal),
                jnp.where(wts > 0, matched_sp[..., 3], saw),
                jnp.where(wts > 0, matched_sp[..., 4], 0.0),
            ],
            axis=-1,
        )
        sanch = jnp.stack(
            [sax, say, sal, saw, jnp.zeros_like(sax)], axis=-1
        )
        reg_sp = encode_boxes(sgt, sanch) * wts[..., None]
        # Capacity accounting + the supervised-positive invariant: a
        # positive cls label MUST carry a localization target. Positive
        # anchors in cells beyond the top-Pc selection are DEMOTED to
        # ignore (-1): leaving them positive trains score≈1 anchors with
        # unsupervised (garbage) boxes that flood the decode's top-K —
        # the round-4 production-table failure (_SPARSE_CELLS_FINE note,
        # docs/UPPERBOUND_DIAGNOSIS.md). The overflow count is still
        # reported so callers can warn when capacity is actually hit.
        n_pos_cells = jnp.sum((cell_any > 0).astype(jnp.int32), axis=-1)
        overflow = jnp.maximum(n_pos_cells - pc, 0)
        supervised = (
            jnp.zeros((b, n), dtype=jnp.bool_)
            .at[jnp.arange(b)[:, None], lanes]
            .max(wts > 0)
        )
        labels = jnp.where((labels == 1) & ~supervised, -1, labels)
        return SparseTargets(
            labels.astype(jnp.int8), cells, wts, reg_sp, overflow
        )

    # Field-wise (structure-of-arrays) encode on (B, n) vectors; encode
    # non-positive cells against their own anchor (exact zeros) so
    # degenerate padded GT never reaches the log() in the codec.
    ax, ay, al, aw = (anchors_flat[None, :, i] for i in range(4))
    matched = lookup(best_gt)  # (B, n, 5)
    gx, gy, gl, gw, gyaw = (
        jnp.where(pos, matched[..., i], a)
        for i, a in enumerate((ax, ay, al, aw, jnp.zeros_like(ax)))
    )
    diag = jnp.sqrt(al * al + aw * aw)
    fields = [
        (gx - ax) / diag * reg_mask,
        (gy - ay) / diag * reg_mask,
        jnp.log(gl / al) * reg_mask,
        jnp.log(gw / aw) * reg_mask,
        jnp.sin(gyaw) * reg_mask,
        jnp.cos(gyaw) * reg_mask,
    ]
    if flat:
        # Structure-of-arrays (B, 6, n) regression targets: stacking on
        # a code-MINOR axis materializes ~21x padded ((n, 6) tiles pad 6
        # lanes to 128 — a 19 GB OOM at production batch); stacking with
        # the big axis minor tiles cleanly.
        return AnchorTargets(
            labels, jnp.stack(fields, axis=1), reg_mask, best_iou
        )
    reg = jnp.stack(fields, axis=-1)
    return AnchorTargets(
        labels.reshape(b, h, w, k),
        reg.reshape(b, h, w, k, 6),
        reg_mask.reshape(b, h, w, k),
        best_iou.reshape(b, h, w, k),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def assign_targets(
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors: jnp.ndarray,
    config: Config,
) -> AnchorTargets:
    """Single-sample assignment: (M, 5) GT -> (H, W, K) targets.

    Thin wrapper over :func:`assign_targets_batched` (B=1).
    """
    out = assign_targets_batched(
        gt_boxes[None], gt_mask[None], anchors, config
    )
    return AnchorTargets(*(x[0] for x in out))


# --------------------------------------------------------------------- #
# Sparse dense-label compression (the cache / device-pool wire format)
# --------------------------------------------------------------------- #
# The dense (…, H*W*K) int8 cls-label map is ~2.4 MB per agent at the
# production grid but is ~zeros outside the positive and ignore sets, so
# caches and device pools store only those flat indices (padded with n =
# out of bounds) and rebuild the dense map on device — two HBM scatters.


def labels_from_sparse_idx(
    pos_idx: jnp.ndarray, ign_idx: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Padded flat indices -> dense (..., n) int8 labels {1, 0, -1}.

    Plain jnp (composable inside an enclosing jit); pad index n is
    dropped by the scatters. Leading dims arbitrary.
    """
    lead = pos_idx.shape[:-1]
    flat_p = pos_idx.reshape((-1, pos_idx.shape[-1]))
    flat_i = ign_idx.reshape((-1, ign_idx.shape[-1]))
    rows = jnp.arange(flat_p.shape[0])[:, None]
    lab = jnp.zeros((flat_p.shape[0], n), jnp.int8)
    lab = lab.at[rows, flat_i].set(jnp.int8(-1), mode="drop")
    lab = lab.at[rows, flat_p].set(jnp.int8(1), mode="drop")
    return lab.reshape(lead + (n,))


@functools.lru_cache(maxsize=None)
def _sparse_label_idx_jit(cap_pos: int, cap_ign: int, n: int):
    """Jitted (rows, n) int8 labels -> (pos_idx, ign_idx, max_pos,
    max_ign). Indices padded with n; the max counts let callers assert
    the caps held (an overflowing row would silently truncate)."""

    def f(labels):
        pos = jax.vmap(
            lambda r: jnp.flatnonzero(r == 1, size=cap_pos, fill_value=n)
        )(labels)
        ign = jax.vmap(
            lambda r: jnp.flatnonzero(r == -1, size=cap_ign, fill_value=n)
        )(labels)
        return (
            pos.astype(jnp.int32),
            ign.astype(jnp.int32),
            (labels == 1).sum(-1).max(),
            (labels == -1).sum(-1).max(),
        )

    return jax.jit(f)


def sparse_label_idx(labels, cap_pos: int, cap_ign: int):
    """Compress dense (rows, n) labels to padded index lists (see
    :func:`labels_from_sparse_idx`)."""
    return _sparse_label_idx_jit(cap_pos, cap_ign, labels.shape[-1])(labels)


label_counts = jax.jit(
    lambda labels: ((labels == 1).sum(-1).max(), (labels == -1).sum(-1).max())
)
