"""HOTA metric golden cases."""

import numpy as np

from v2x_sim_tpu.tracking.mot_metrics import evaluate_hota


def _frames(specs):
    """specs: list per frame of [(x, y, id), ...] -> (N, 6) arrays."""
    out = []
    for frame in specs:
        rows = [[x, y, 4.0, 2.0, 0.0, i] for (x, y, i) in frame]
        out.append(np.asarray(rows, np.float32).reshape(-1, 6))
    return out


def test_perfect_tracking_hota_1():
    gt = _frames([[(0, 0, 1), (10, 10, 2)]] * 5)
    trk = _frames([[(0, 0, 7), (10, 10, 8)]] * 5)
    m = evaluate_hota(gt, trk)
    assert abs(m["hota"] - 1.0) < 1e-6
    assert abs(m["det_a"] - 1.0) < 1e-6


def test_id_switch_halves_association():
    # One GT tracked 4 frames: predictions switch identity halfway.
    gt = _frames([[(0, 0, 1)]] * 4)
    trk = _frames([[(0, 0, 10)], [(0, 0, 10)], [(0, 0, 11)], [(0, 0, 11)]])
    m = evaluate_hota(gt, trk)
    assert abs(m["det_a"] - 1.0) < 1e-6
    # Each TP: TPA=2, FNA=2, FPA=0 -> A=0.5.
    assert abs(m["ass_a"] - 0.5) < 1e-6
    assert abs(m["hota"] - np.sqrt(0.5)) < 1e-6


def test_missed_detections_lower_det_a():
    gt = _frames([[(0, 0, 1)]] * 4)
    trk = _frames([[(0, 0, 5)], [], [(0, 0, 5)], []])
    m = evaluate_hota(gt, trk)
    # TP=2, FN=2, FP=0 -> DetA=0.5. Association per standard HOTA also
    # counts the unmatched GT frames in FNA: TPA=2, FNA=2 -> AssA=0.5.
    assert abs(m["det_a"] - 0.5) < 1e-6
    assert abs(m["ass_a"] - 0.5) < 1e-6


def test_empty_sequences():
    m = evaluate_hota([np.zeros((0, 6))] * 3, [np.zeros((0, 6))] * 3)
    assert m["hota"] == 0.0


def test_crossing_global_alignment_overrides_frame_iou():
    """3-GT crossing golden: TrackEval's two-pass matching differs from
    single-pass IoU Hungarian, and the hand-computed HOTA confirms the
    two-pass result.

    Boxes are 4 x 2 (l x w, yaw 0); IoU at a pure y-offset dy is
    4(2-dy) / (16 - 4(2-dy)): dy=1 -> 1/3, dy=0.5 -> 0.6, dy=1.5 -> 1/7.

    Frames 1-3: T1 sits exactly on A (y=0), T2 on B (y=10), T3 on C
    (y=20). Frame 4: A at y=0, B at y=2.5, C at y=20; T1 at y=1
    (iou(A,T1)=1/3, iou(B,T1)=1/7), T2 at y=0.5 (iou(A,T2)=0.6,
    iou(B,T2)=0), T3 on C.

    Raw-IoU Hungarian in frame 4 picks the swap (0.6 + 1/7 > 1/3 + 0).
    TrackEval weights frame-4 scores by the global alignment
    (A,T1)=0.706 vs (A,T2)=0.087, so identity wins: matches are
    (A,T1) iou=1/3 and (B,T2) iou=0 (no TP for B).

    Hand computation over alphas {0.05..0.95 step 0.05}:
      alpha <= 0.30 (6 alphas): TP=11, FN=1, FP=1 -> DetA = 11/13;
        pair TPAs (A,T1)=4, (B,T2)=3, (C,T3)=4 ->
        AssA = (4*1 + 3*(3/5) + 4*1)/11 = 9.8/11;
        HOTA_a = sqrt(9.8/13).
      alpha >= 0.35 (13 alphas): TP=10, FN=2, FP=2 -> DetA = 5/7;
        TPAs (A,T1)=3, (B,T2)=3, (C,T3)=4 ->
        AssA = (1.8 + 1.8 + 4)/10 = 0.76;
        HOTA_a = sqrt(5/7 * 0.76).
    (The single-pass swap instead yields frame-4 TPs (A,T2) at 0.6 and
    (B,T1) at 1/7, a different per-alpha profile — e.g. its
    alpha=0.5 DetA is 11/13, not 5/7.)
    """
    gt = _frames(
        [[(0, 0, 1), (0, 10, 2), (0, 20, 3)]] * 3
        + [[(0, 0, 1), (0, 2.5, 2), (0, 20, 3)]]
    )
    trk = _frames(
        [[(0, 0, 10), (0, 10, 11), (0, 20, 12)]] * 3
        + [[(0, 1.0, 10), (0, 0.5, 11), (0, 20, 12)]]
    )
    m = evaluate_hota(gt, trk)
    exp_det = (6 * (11 / 13) + 13 * (5 / 7)) / 19
    exp_ass = (6 * (9.8 / 11) + 13 * 0.76) / 19
    exp_hota = (6 * np.sqrt(9.8 / 13) + 13 * np.sqrt(5 / 7 * 0.76)) / 19
    assert abs(m["det_a"] - exp_det) < 1e-6, m
    assert abs(m["ass_a"] - exp_ass) < 1e-6, m
    assert abs(m["hota"] - exp_hota) < 1e-6, m
    # The single-pass value (swap matching) would be DetA
    # (6*(12/13-1/13... ) — concretely its alpha<=0.10 TP is 12 and its
    # alpha=0.5 DetA is 11/13 > 5/7 — so equality with exp_* would fail.
