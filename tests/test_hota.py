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
