"""Tracking CLI: SORT over dumped detections + CLEAR-MOT evaluation.

Analog of the reference's tracking pipeline (SURVEY.md §3.5:
det result dump -> MOT conversion -> sort.py -> TrackEval). Input is the
.npz det dumps produced by `test_det --save_dets`; each (sample, agent)
sequence is tracked independently and evaluated against GT. When the
dump carries `gt_ids` (real nuScenes `instance_token`-derived track
identities, datasets.nuscenes.NuScenesTables.global_boxes) those are the
MOT ground truth; nearest-neighbor linking (`link_gt_ids`) remains only
as the fallback for id-less synthetic dumps.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dets", required=True, help="dir of test_det --save_dets dumps")
    p.add_argument("--max_age", type=int, default=3)
    p.add_argument("--min_hits", type=int, default=2)
    p.add_argument("--iou_threshold", type=float, default=0.1)
    p.add_argument("--eval_iou", type=float, default=0.5)
    return p.parse_args()


def link_gt_ids(gt_frames):
    """Assign stable ids to per-frame GT boxes by nearest-neighbor linking."""
    out = []
    prev = None  # (boxes, ids)
    next_id = 1
    for boxes in gt_frames:
        ids = np.zeros(len(boxes), np.int64)
        used = set()
        if prev is not None and len(prev[0]) and len(boxes):
            d = np.linalg.norm(
                boxes[:, None, :2] - prev[0][None, :, :2], axis=-1
            )
            for i in np.argsort(d.min(1)):
                # Greedy with fallback: if the nearest previous box is
                # already claimed, take the next-nearest inside the gate
                # (two close vehicles sharing a nearest neighbor used to
                # cost one of them a spurious new id).
                for j in np.argsort(d[i]):
                    j = int(j)
                    if d[i, j] >= 3.0:
                        break
                    if j not in used:
                        ids[i] = prev[1][j]
                        used.add(j)
                        break
        for i in range(len(boxes)):
            if ids[i] == 0:
                ids[i] = next_id
                next_id += 1
        out.append(np.concatenate([boxes, ids[:, None]], -1))
        prev = (boxes, ids)
    return out


def main():
    args = parse_args()
    from v2x_sim_tpu.tracking.mot_metrics import evaluate_hota, evaluate_mot
    from v2x_sim_tpu.tracking.sort import track_sequence

    files = sorted(
        os.path.join(args.dets, f)
        for f in os.listdir(args.dets)
        if f.endswith(".npz")
    )
    if not files:
        raise FileNotFoundError(f"no det dumps under {args.dets}")

    # Frames are ordered batches of (B, A, ...): flatten to per-agent
    # sequences over time (batch index = time, matching test_det's
    # sequential dump order).
    det_seq = {}
    gt_seq = {}
    gtid_seq = {}
    have_ids = True
    for f in files:
        with np.load(f) as z:
            b, a = z["boxes"].shape[:2]
            have_ids = have_ids and "gt_ids" in z
            for bi in range(b):
                for ai in range(a):
                    if not z["agent_mask"][bi, ai]:
                        continue
                    key = ai
                    keep = z["gt_mask"][bi, ai]
                    det_seq.setdefault(key, []).append(
                        z["boxes"][bi, ai][z["valid"][bi, ai]]
                    )
                    gt_seq.setdefault(key, []).append(z["gt_boxes"][bi, ai][keep])
                    if "gt_ids" in z:
                        gtid_seq.setdefault(key, []).append(z["gt_ids"][bi, ai][keep])

    if not have_ids:
        print("note: dumps carry no gt_ids; GT identities NN-linked (synthetic)")
    results = {}
    for agent, frames in sorted(det_seq.items()):
        tracks = track_sequence(
            frames,
            max_age=args.max_age,
            min_hits=args.min_hits,
            iou_threshold=args.iou_threshold,
        )
        if have_ids:
            gt = [
                np.concatenate([boxes, ids[:, None].astype(np.float64)], -1)
                for boxes, ids in zip(gt_seq[agent], gtid_seq[agent])
            ]
        else:
            gt = link_gt_ids(gt_seq[agent])
        m = evaluate_mot(gt, tracks, iou_threshold=args.eval_iou)
        m.update(evaluate_hota(gt, tracks))
        results[f"agent{agent}"] = {k: round(v, 4) for k, v in m.items()}
    motas = [r["mota"] for r in results.values()]
    hotas = [r["hota"] for r in results.values()]
    results["global"] = {
        "mota": round(float(np.mean(motas)), 4),
        "hota": round(float(np.mean(hotas)), 4),
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
