"""Tracking benchmark sweep -> BENCH_TABLE_TRACK.md.

The reference publishes a third per-task table — tracking — built by
running SORT over each detection mode's dumped results and scoring with
TrackEval (/root/reference/README.md:36,101; † coperception/tools/track/,
SURVEY.md §3.5). This tool reproduces that artifact offline: it loads the
per-mode weights the det sweep saved (`bench_table --save_states`),
runs the detector frame-by-frame over synthetic TEMPORAL sequences
(datasets.synthetic.generate_sequence — persistent vehicle ids,
per-sequence occlusion so only collaboration keeps occluded tracks
alive), tracks each (sequence, agent) stream with SORT, and reports
MOTA / MOTP / HOTA per mode.

Usage (after the det sweep):
  python -m v2x_sim_tpu.tools.bench_table --grid full --steps 12000 \
      --save_states runs/table_states ...
  python -m v2x_sim_tpu.tools.bench_table_track --states runs/table_states \
      --grid full --agents 6 --out BENCH_TABLE_TRACK.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import re
import time

import numpy as np

from v2x_sim_tpu.tools.bench_table import ALL_MODES, build_config, build_spec


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--states", required=True,
        help="dir of <mode>_seed<seed>.pkl from bench_table --save_states",
    )
    p.add_argument("--modes", default="all", help="comma list or 'all'")
    p.add_argument("--seed", type=int, default=0, help="which saved seed")
    p.add_argument("--grid", default="full",
                   choices=["tiny", "tiny1m", "small", "medium", "full"])
    p.add_argument("--agents", type=int, default=2)
    p.add_argument("--occlusion", type=float, default=0.45)
    p.add_argument("--width_mult", type=float, default=1.0)
    p.add_argument("--seqs", type=int, default=8,
                   help="independent sequences (eval seeds 950k+)")
    p.add_argument("--frames", type=int, default=20, help="frames/sequence")
    p.add_argument("--dt", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=4,
                   help="frames per predict() launch")
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--nms_iou", type=float, default=0.1)
    p.add_argument("--max_boxes", type=int, default=16)
    p.add_argument("--max_age", type=int, default=3)
    p.add_argument("--min_hits", type=int, default=2)
    p.add_argument("--assoc_iou", type=float, default=0.1,
                   help="SORT association gate")
    p.add_argument("--eval_iou", type=float, default=0.5,
                   help="CLEAR-MOT matching threshold")
    p.add_argument("--out", default="BENCH_TABLE_TRACK.md")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def run_mode_track(mode, args, config, spec, state, sequences):
    import jax.numpy as jnp

    from v2x_sim_tpu.tracking.mot_metrics import evaluate_hota, evaluate_mot
    from v2x_sim_tpu.tracking.sort import track_sequence

    t0 = time.time()
    per_stream = []  # one (gt, tracks) eval per (sequence, agent)
    for frames in sequences:
        tlen = len(frames)
        # Batch frames of one sequence along B (scenes are independent in
        # predict): pad the tail chunk by repetition, slice off after.
        dets = None  # (T, A, K, 5/score/valid) accumulated
        boxes_l, scores_l, valid_l = [], [], []
        for s0 in range(0, tlen, args.batch):
            idx = [min(s0 + i, tlen - 1) for i in range(args.batch)]
            chunk = {
                k: jnp.asarray(np.stack([frames[i][k] for i in idx]))
                for k in ("points", "point_mask", "trans", "agent_mask")
            }
            res = state["module"].predict(
                state["state"], chunk, args.max_boxes, args.nms_iou,
                args.score_threshold,
            )
            keep = tlen - s0 if s0 + args.batch > tlen else args.batch
            boxes_l.append(np.asarray(res.boxes)[:keep])
            scores_l.append(np.asarray(res.scores)[:keep])
            valid_l.append(np.asarray(res.valid)[:keep])
        boxes = np.concatenate(boxes_l)   # (T, A, K, 5)
        scores = np.concatenate(scores_l)
        valid = np.concatenate(valid_l)

        a = boxes.shape[1]
        for ai in range(a):
            det_frames = [
                boxes[t, ai][valid[t, ai]] for t in range(tlen)
            ]
            gt = []
            for t in range(tlen):
                keep = frames[t]["gt_mask"][ai]
                gt.append(
                    np.concatenate(
                        [
                            frames[t]["gt_boxes"][ai][keep],
                            frames[t]["gt_ids"][ai][keep, None].astype(
                                np.float64
                            ),
                        ],
                        -1,
                    )
                )
            tracks = track_sequence(
                det_frames,
                max_age=args.max_age,
                min_hits=args.min_hits,
                iou_threshold=args.assoc_iou,
            )
            m = evaluate_mot(gt, tracks, iou_threshold=args.eval_iou)
            m.update(evaluate_hota(gt, tracks))
            per_stream.append(m)

    row = {"mode": mode}
    for k in ("mota", "motp", "hota", "det_a", "ass_a"):
        vals = [m[k] for m in per_stream if k in m]
        row[k] = round(float(np.mean(vals)), 4) if vals else float("nan")
    row["eval_s"] = round(time.time() - t0, 1)
    print(json.dumps(row), flush=True)
    return row


def load_state(path, mode, args, config):
    """Rebuild the DetModule for `mode` and wrap the pickled weights in a
    TrainState predict() can consume. disco+kd weights are a plain disco
    graph (the kd tap adds no params — models/det/net.py)."""
    import jax

    from v2x_sim_tpu.train.det_module import DetModule, TrainState

    with open(path, "rb") as f:
        blob = pickle.load(f)
    mod = DetModule(
        config,
        mode="disco" if mode == "disco+kd" else mode,
        width_mult=args.width_mult,
    )
    state = TrainState(
        params=jax.device_put(blob["params"]),
        batch_stats=jax.device_put(blob["batch_stats"]),
        opt_state=None,
        step=np.zeros((), np.int32),
    )
    return {"module": mod, "state": state}


def write_table(rows, args, path):
    lines = [
        "# Tracking benchmark (SORT over per-mode detections, synthetic "
        "temporal sequences)",
        "",
        f"Generated by `python -m v2x_sim_tpu.tools.bench_table_track "
        f"--states {args.states} --grid {args.grid} --agents {args.agents} "
        f"--seqs {args.seqs} --frames {args.frames} --dt {args.dt} "
        f"--occlusion {args.occlusion} --score_threshold "
        f"{args.score_threshold} --seed {args.seed}`.",
        "",
        "Each mode's det weights come from the det sweep "
        "(`bench_table --save_states`); the detector runs frame-by-frame "
        f"over {args.seqs} held-out sequences x {args.frames} frames "
        "(persistent vehicle ids, per-sequence occlusion), SORT links "
        "detections per (sequence, agent) stream, and CLEAR-MOT/HOTA "
        "score against the persistent GT identities. **Absolute numbers "
        "are not comparable to the reference's published table** (short "
        "synthetic training budget) — the per-mode ordering is the "
        "signal, and it should follow the det table's.",
        "",
    ]
    cols = [c for c in rows[0] if c != "eval_s"]
    lines.append("| " + " | ".join(cols) + " |")
    lines.append("|" + "---|" * len(cols))
    for r in rows:
        cells = [
            str(r[c]) if isinstance(r[c], str) else f"{r[c]:g}" for c in cols
        ]
        lines.append("| " + " | ".join(cells) + " |")
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from v2x_sim_tpu.datasets.synthetic import generate_sequence
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.modes == "all":
        # Every mode with a saved state for this seed, in table order.
        have = {
            re.sub(rf"_seed{args.seed}\.pkl$", "", os.path.basename(f))
            for f in glob.glob(
                os.path.join(args.states, f"*_seed{args.seed}.pkl")
            )
        }
        modes = [m for m in ALL_MODES if m in have]
        if not modes:
            raise FileNotFoundError(
                f"no *_seed{args.seed}.pkl under {args.states}"
            )
    else:
        modes = [m.strip() for m in args.modes.split(",")]

    config = build_config(args)
    spec = build_spec(args)
    sequences = [
        generate_sequence(
            config, spec, seed=950_000 + s, num_frames=args.frames,
            dt=args.dt,
        )
        for s in range(args.seqs)
    ]
    rows = []
    for mode in modes:
        path = os.path.join(args.states, f"{mode}_seed{args.seed}.pkl")
        state = load_state(path, mode, args, config)
        rows.append(run_mode_track(mode, args, config, spec, state, sequences))
    write_table(rows, args, args.out)


if __name__ == "__main__":
    main()
