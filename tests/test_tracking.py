"""SORT tracker and MOT metrics."""

import numpy as np

from v2x_sim_tpu.tracking.mot_metrics import evaluate_mot
from v2x_sim_tpu.tracking.sort import Sort, track_sequence


def _moving_boxes(num_frames, starts, velocity):
    frames = []
    for f in range(num_frames):
        boxes = []
        for (x, y) in starts:
            boxes.append([x + velocity[0] * f, y + velocity[1] * f, 4.0, 2.0, 0.0])
        frames.append(np.asarray(boxes, np.float32))
    return frames


def test_stable_ids_two_objects():
    frames = _moving_boxes(8, [(0, 0), (15, 15)], (0.5, 0.0))
    out = track_sequence(frames, min_hits=1)
    ids_per_frame = [set(o[:, 5].astype(int)) for o in out]
    # After the first frame both tracks are alive with constant ids.
    final_ids = ids_per_frame[-1]
    assert len(final_ids) == 2
    for ids in ids_per_frame[2:]:
        assert ids == final_ids


def test_track_killed_after_max_age():
    frames = _moving_boxes(3, [(0, 0)], (0.2, 0.0))
    frames += [np.zeros((0, 5), np.float32)] * 6  # object disappears
    tracker = Sort(max_age=2, min_hits=1)
    outs = [tracker.update(f) for f in frames]
    assert len(outs[2]) == 1
    assert len(outs[-1]) == 0
    assert len(tracker.trackers) == 0


def test_new_track_gets_new_id():
    tracker = Sort(min_hits=1)
    a = tracker.update(np.asarray([[0, 0, 4, 2, 0]], np.float32))
    b = tracker.update(np.asarray([[0.2, 0, 4, 2, 0], [20, 20, 4, 2, 0]], np.float32))
    assert len(a) == 1 and len(b) == 2
    assert set(b[:, 5]) > set(a[:, 5])


def test_mot_perfect_tracking():
    gt = []
    trk = []
    for f in range(5):
        boxes = np.asarray(
            [[f * 0.5, 0, 4, 2, 0, 1], [10, f * 0.3, 4, 2, 0, 2]], np.float32
        )
        gt.append(boxes)
        trk.append(boxes.copy())
    m = evaluate_mot(gt, trk)
    assert m["mota"] == 1.0
    assert m["id_switches"] == 0


def test_mot_counts_misses_and_fps():
    gt = [np.asarray([[0, 0, 4, 2, 0, 1]], np.float32)] * 4
    trk = [np.zeros((0, 6), np.float32)] * 2 + [
        np.asarray([[0, 0, 4, 2, 0, 7], [30, 30, 4, 2, 0, 8]], np.float32)
    ] * 2
    m = evaluate_mot(gt, trk)
    assert m["misses"] == 2
    assert m["false_positives"] == 2
    assert m["mota"] == 1.0 - 4 / 4


def test_mot_id_switch_detected():
    gt = [np.asarray([[0, 0, 4, 2, 0, 1]], np.float32)] * 4
    trk = [
        np.asarray([[0, 0, 4, 2, 0, 10]], np.float32),
        np.asarray([[0, 0, 4, 2, 0, 10]], np.float32),
        np.asarray([[0, 0, 4, 2, 0, 11]], np.float32),  # switch
        np.asarray([[0, 0, 4, 2, 0, 11]], np.float32),
    ]
    assert evaluate_mot(gt, trk)["id_switches"] == 1
