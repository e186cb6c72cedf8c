"""mAP evaluator golden cases."""

import numpy as np

from v2x_sim_tpu.utils.mean_ap import average_precision, eval_map


def _pad(boxes, k):
    out = np.zeros((k, 5), np.float32)
    out[: len(boxes)] = boxes
    return out


def test_perfect_detection_ap1():
    gt = np.asarray([[0, 0, 4, 2, 0.3], [10, 5, 4, 2, -0.5]], np.float32)
    det = _pad(gt, 8)[None]
    scores = np.asarray([[0.9, 0.8, 0, 0, 0, 0, 0, 0]], np.float32)
    valid = scores > 0.5
    ap = eval_map(det, scores, valid, gt[None], np.ones((1, 2), bool))
    assert ap == 1.0


def test_missed_gt_halves_recall():
    gt = np.asarray([[0, 0, 4, 2, 0.0], [10, 5, 4, 2, 0.0]], np.float32)
    det = _pad(gt[:1], 4)[None]
    scores = np.asarray([[0.9, 0, 0, 0]], np.float32)
    valid = scores > 0.5
    ap = eval_map(det, scores, valid, gt[None], np.ones((1, 2), bool))
    assert abs(ap - 0.5) < 1e-6


def test_false_positive_reduces_precision():
    gt = np.asarray([[0, 0, 4, 2, 0.0]], np.float32)
    det = np.zeros((1, 4, 5), np.float32)
    det[0, 0] = gt[0]
    det[0, 1] = [20, 20, 4, 2, 0]  # FP scored higher than the TP
    scores = np.asarray([[0.7, 0.9, 0, 0]], np.float32)
    valid = scores > 0.5
    ap = eval_map(det, scores, valid, gt[None], np.ones((1, 1), bool))
    assert 0.4 < ap < 0.6  # TP arrives second: precision 1/2 at recall 1


def test_localization_threshold():
    gt = np.asarray([[0, 0, 4, 2, 0.0]], np.float32)
    det = np.asarray([[[1.5, 0, 4, 2, 0.0]]], np.float32)  # IoU ~ 0.45
    scores = np.asarray([[0.9]], np.float32)
    valid = np.ones((1, 1), bool)
    ap05 = eval_map(det, scores, valid, gt[None], np.ones((1, 1), bool), 0.4)
    ap07 = eval_map(det, scores, valid, gt[None], np.ones((1, 1), bool), 0.7)
    assert ap05 == 1.0 and ap07 == 0.0


def test_average_precision_monotone_envelope():
    rec = np.asarray([0.25, 0.5, 0.75, 1.0])
    prec = np.asarray([1.0, 0.5, 0.75, 0.5])
    ap = average_precision(rec, prec)
    assert 0.5 <= ap <= 1.0


def test_center_distance_matching():
    """match="center": threshold is meters; a 1.5 m-off detection is a TP
    at 2.0 m and an FP at 1.0 m, independent of box overlap."""
    gt = np.asarray([[0, 0, 4, 2, 0.0]], np.float32)
    det = _pad(np.asarray([[1.5, 0, 4, 2, 0.0]]), 4)[None]
    scores = np.asarray([[0.9, 0, 0, 0]], np.float32)
    valid = scores > 0.5
    gt_mask = np.ones((1, 1), bool)
    ap2 = eval_map(det, scores, valid, gt[None], gt_mask, 2.0, match="center")
    ap1 = eval_map(det, scores, valid, gt[None], gt_mask, 1.0, match="center")
    assert ap2 == 1.0 and ap1 == 0.0


def test_center_matching_prefers_nearest_gt():
    """Greedy center matching takes the nearest unmatched GT."""
    gt = np.asarray([[0, 0, 4, 2, 0.0], [3, 0, 4, 2, 0.0]], np.float32)
    det = _pad(np.asarray([[2.0, 0, 4, 2, 0.0], [0.2, 0, 4, 2, 0.0]]), 4)[None]
    scores = np.asarray([[0.9, 0.8, 0, 0]], np.float32)
    valid = scores > 0.5
    gt_mask = np.ones((1, 2), bool)
    # det0 (score .9) grabs GT1 (dist 1.0 < 2.0); det1 then matches GT0.
    ap = eval_map(det, scores, valid, gt[None], gt_mask, 2.0, match="center")
    assert ap == 1.0


def test_center_matching_agent_keys():
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    gt = np.zeros((1, 1, 2, 5), np.float32)
    gt[0, 0, :, 2:4] = (4, 2)
    gt[0, 0, 1, 0] = 10
    det = gt.copy()
    scores = np.full((1, 1, 2), 0.9, np.float32)
    valid = np.ones((1, 1, 2), bool)
    out = eval_map_agents(
        det, scores, valid, gt, np.ones((1, 1, 2), bool),
        np.ones((1, 1), bool), iou_thresholds=(1.0, 2.0), match="center",
    )
    assert out["mAP@1.0m"] == 1.0 and out["mAP@2.0m"] == 1.0
