"""MOT evaluation: MOTA / MOTP / IDF1-style metrics.

Replacement for the reference's vendored TrackEval dependency
(/root/reference/README.md:111; SURVEY.md §2.2): the CLEAR-MOT metrics
(MOTA, MOTP) plus ID switches, computed directly with the framework's
exact rotated IoU and Hungarian matching. Host-side post-hoc pipeline,
like the reference's.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from scipy.optimize import linear_sum_assignment

from v2x_sim_tpu.ops.iou_host import rotated_iou_matrix_np


def evaluate_mot(
    gt_frames: List[np.ndarray],
    trk_frames: List[np.ndarray],
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """CLEAR-MOT over one sequence.

    Args:
      gt_frames: per frame (G, 6) [x, y, l, w, yaw, gt_id].
      trk_frames: per frame (T, 6) [x, y, l, w, yaw, track_id].
      iou_threshold: match acceptance threshold.

    Returns:
      {"mota", "motp", "id_switches", "misses", "false_positives",
       "num_gt", "matches"}.
    """
    assert len(gt_frames) == len(trk_frames)
    misses = fps = idsw = matches = num_gt = 0
    motp_sum = 0.0
    last_match: Dict[int, int] = {}  # gt_id -> track_id from previous frames

    for gt, trk in zip(gt_frames, trk_frames):
        gt = np.asarray(gt).reshape(-1, 6)
        trk = np.asarray(trk).reshape(-1, 6)
        num_gt += len(gt)
        if len(gt) == 0:
            fps += len(trk)
            continue
        if len(trk) == 0:
            misses += len(gt)
            continue
        iou = rotated_iou_matrix_np(gt[:, :5], trk[:, :5])
        rows, cols = linear_sum_assignment(-iou)
        matched_g, matched_t = set(), set()
        for r, c in zip(rows, cols):
            if iou[r, c] >= iou_threshold:
                gid, tid = int(gt[r, 5]), int(trk[c, 5])
                if gid in last_match and last_match[gid] != tid:
                    idsw += 1
                last_match[gid] = tid
                matches += 1
                motp_sum += iou[r, c]
                matched_g.add(r)
                matched_t.add(c)
        misses += len(gt) - len(matched_g)
        fps += len(trk) - len(matched_t)

    mota = 1.0 - (misses + fps + idsw) / max(num_gt, 1)
    motp = motp_sum / max(matches, 1)
    return {
        "mota": float(mota),
        "motp": float(motp),
        "id_switches": float(idsw),
        "misses": float(misses),
        "false_positives": float(fps),
        "num_gt": float(num_gt),
        "matches": float(matches),
    }


def evaluate_hota(
    gt_frames: List[np.ndarray],
    trk_frames: List[np.ndarray],
    alphas: np.ndarray = np.arange(0.05, 0.96, 0.05),
) -> Dict[str, float]:
    """HOTA (Higher Order Tracking Accuracy), averaged over IoU alphas.

    Follows the standard decomposition HOTA_a = sqrt(DetA_a * AssA_a):
    per-frame Hungarian matching at IoU >= alpha gives TP/FN/FP (DetA);
    each TP's association score A(c) = TPA / (TPA + FNA + FPA) over the
    whole sequence gives AssA. (TrackEval additionally iterates the
    matching against association scores; this single-pass variant tracks
    it closely and needs no vendored dependency.)
    """
    assert len(gt_frames) == len(trk_frames)
    # Precompute per-frame IoU matrices + id arrays once.
    frames = []
    for gt, trk in zip(gt_frames, trk_frames):
        gt = np.asarray(gt).reshape(-1, 6)
        trk = np.asarray(trk).reshape(-1, 6)
        iou = rotated_iou_matrix_np(gt[:, :5], trk[:, :5])
        frames.append((gt[:, 5].astype(int), trk[:, 5].astype(int), iou))

    # Per-id frame counts for association denominators.
    gt_count: Dict[int, int] = {}
    tr_count: Dict[int, int] = {}
    for gids, tids, _ in frames:
        for g in gids:
            gt_count[g] = gt_count.get(g, 0) + 1
        for t in tids:
            tr_count[t] = tr_count.get(t, 0) + 1

    hotas, detas, assas = [], [], []
    for alpha in alphas:
        tp_pairs: List[tuple] = []
        fn = fp = 0
        pair_count: Dict[tuple, int] = {}
        for gids, tids, iou in frames:
            if iou.size:
                rows, cols = linear_sum_assignment(-iou)
                matched_g, matched_t = set(), set()
                for r, c in zip(rows, cols):
                    if iou[r, c] >= alpha:
                        key = (gids[r], tids[c])
                        pair_count[key] = pair_count.get(key, 0) + 1
                        tp_pairs.append(key)
                        matched_g.add(r)
                        matched_t.add(c)
                fn += len(gids) - len(matched_g)
                fp += len(tids) - len(matched_t)
            else:
                fn += len(gids)
                fp += len(tids)
        tp = len(tp_pairs)
        if tp + fn + fp == 0:
            continue
        det_a = tp / (tp + fn + fp)
        if tp:
            ass = 0.0
            for (g, t) in tp_pairs:
                tpa = pair_count[(g, t)]
                fna = gt_count[g] - tpa
                fpa = tr_count[t] - tpa
                ass += tpa / (tpa + fna + fpa)
            ass_a = ass / tp
        else:
            ass_a = 0.0
        detas.append(det_a)
        assas.append(ass_a)
        hotas.append(float(np.sqrt(det_a * ass_a)))

    return {
        "hota": float(np.mean(hotas)) if hotas else 0.0,
        "det_a": float(np.mean(detas)) if detas else 0.0,
        "ass_a": float(np.mean(assas)) if assas else 0.0,
    }
