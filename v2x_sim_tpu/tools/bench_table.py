"""Collaboration-mode benchmark sweep -> BENCH_TABLE.md.

The reference's QA artifact is its per-mode benchmark table
(/root/reference/README.md:99-101 defers to per-task READMEs with
mAP@0.5/0.7 rows per --com mode). This tool reproduces that artifact
end-to-end on synthetic scenes with per-agent occlusion dropout, so the
signature ordering — lowerbound < naive fusion <= learned fusion <=
upperbound — is measurable offline without the (unreachable) dataset.

Each mode trains from scratch on streaming synthetic batches (fresh seed
per step: no memorization) and evaluates held-out scenes with the same
mAP evaluator the real-data CLI uses (utils/mean_ap.eval_map_agents).

Usage:
  python -m v2x_sim_tpu.tools.bench_table --cpu --grid tiny \
      --steps 400 --out BENCH_TABLE.md            # CI-sized, ~30 min
  python -m v2x_sim_tpu.tools.bench_table --steps 2000 --grid full \
      --modes lowerbound,disco,upperbound         # TPU, flagship modes
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

ALL_MODES = (
    "lowerbound",
    "sum",
    "mean",
    "max",
    "cat",
    "agent",
    "when2com",
    "who2com",
    "v2v",
    "disco",
    "upperbound",
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--task", default="det", choices=["det", "seg"],
        help="det: mAP table (train_codet analog); seg: mIoU table",
    )
    p.add_argument("--modes", default="all", help="comma list or 'all'")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument(
        "--width_mult", type=float, default=1.0,
        help="uniform STPN channel scale; 0.25 trains to useful mAP in "
        "CI-sized step budgets (full width needs ~10x the steps)",
    )
    p.add_argument("--eval_batches", type=int, default=8)
    p.add_argument(
        "--grid", default="tiny", choices=["tiny", "tiny1m", "small", "full"],
        help="tiny=32x32/2m (CPU-feasible), tiny1m=32x32/1m (vehicle "
        "footprints span cells — use for seg), small=64x64, full=256x256",
    )
    p.add_argument(
        "--seg_depth", type=int, default=4,
        help="UNet down/up stages (seg task only; reference = 4). The "
        "bottleneck — where fusion happens — sits at H/2^depth: use 2 at "
        "tiny grids so collaboration has resolution to transfer",
    )
    p.add_argument("--agents", type=int, default=2)
    p.add_argument("--occlusion", type=float, default=0.45)
    p.add_argument("--out", default="BENCH_TABLE.md")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--match", default="iou", choices=["iou", "center"],
        help="det AP matching: rotated IoU (reference) or center distance "
        "in meters (nuScenes-style; use at coarse CI grids where IoU@0.5 "
        "is dominated by voxel quantization)",
    )
    p.add_argument(
        "--thresholds", default=None,
        help="comma list of AP thresholds (default: 0.5,0.7 for iou; "
        "1.0,2.0 for center)",
    )
    p.add_argument("--score_threshold", type=float, default=0.05)
    p.add_argument("--nms_iou", type=float, default=0.1)
    p.add_argument("--max_boxes", type=int, default=16)
    return p.parse_args()


def build_config(args):
    from v2x_sim_tpu.configs.config import Config, GridConfig

    if args.grid == "tiny":
        grid = GridConfig(
            voxel_size=(2.0, 2.0, 1.25),
            area_extents=((-32, 32), (-32, 32), (-3, 2)),
        )
        layer = 1
    elif args.grid == "tiny1m":
        grid = GridConfig(
            voxel_size=(1.0, 1.0, 0.625),
            area_extents=((-16, 16), (-16, 16), (-3, 2)),
        )
        layer = 1
    elif args.grid == "small":
        grid = GridConfig(voxel_size=(1.0, 1.0, 0.625))
        layer = 2
    else:
        grid = GridConfig()
        layer = 3
    return Config(grid=grid, num_agents=args.agents, fusion_layer=layer)


def build_spec(args):
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec

    if args.grid in ("tiny", "tiny1m"):
        return SyntheticSpec(
            num_vehicles=6, points_per_agent=512, max_gt=8,
            points_per_vehicle=48, occlusion_prob=args.occlusion,
            lidar_range=40.0 if args.grid == "tiny" else 20.0,
        )
    return SyntheticSpec(occlusion_prob=args.occlusion)


def run_mode(mode, args, config, spec):
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.datasets.synthetic import generate_batch
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    drop = ("visible", "gt_vehicle")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    mod = DetModule(
        config, mode=mode, learning_rate=args.lr, width_mult=args.width_mult
    )
    raw0 = generate_batch(config, spec, batch_size=args.batch, seed=args.seed)
    state = mod.init(jax.random.PRNGKey(args.seed), to_dev(raw0))

    # Warmup step: absorb the jit compile so train_s / steps_per_s measure
    # steady-state throughput, comparable across modes (round-1 table had
    # the first mode 15x "slower" purely from a cold compile cache).
    state, _ = mod.train_step(state, mod.prepare_batch(to_dev(raw0)))

    t0 = time.time()
    loss = float("nan")
    for s in range(args.steps):
        raw = generate_batch(
            config, spec, batch_size=args.batch, seed=10_000 + s
        )
        state, metrics = mod.train_step(state, mod.prepare_batch(to_dev(raw)))
        loss = metrics["loss"]
    loss = float(loss)  # one sync at the end, not per step
    train_s = time.time() - t0

    det_b, det_s, det_v, gt_b, gt_m, am = [], [], [], [], [], []
    t0 = time.time()
    for e in range(args.eval_batches):
        raw = generate_batch(
            config, spec, batch_size=args.batch, seed=900_000 + e
        )
        # predict consumes the raw batch directly (it voxelizes itself);
        # prepare_batch would add a full anchor-assignment pass that eval
        # never reads, inflating eval_s for every mode.
        res = mod.predict(
            state, to_dev(raw), args.max_boxes, args.nms_iou,
            args.score_threshold,
        )
        det_b.append(np.asarray(res.boxes))
        det_s.append(np.asarray(res.scores))
        det_v.append(np.asarray(res.valid))
        gt_b.append(raw["gt_boxes"])
        gt_m.append(raw["gt_mask"])
        am.append(raw["agent_mask"])
    eval_s = time.time() - t0

    thresholds = tuple(
        float(t) for t in (
            args.thresholds.split(",") if args.thresholds
            else ("1.0", "2.0") if args.match == "center" else ("0.5", "0.7")
        )
    )
    maps = eval_map_agents(
        np.concatenate(det_b),
        np.concatenate(det_s),
        np.concatenate(det_v),
        np.concatenate(gt_b),
        np.concatenate(gt_m),
        np.concatenate(am),
        iou_thresholds=thresholds,
        match=args.match,
    )
    unit = "m" if args.match == "center" else ""
    row = {"mode": mode}
    for t in thresholds:
        row[f"mAP@{t}{unit}"] = round(maps[f"mAP@{t}{unit}"], 4)
    row.update({
        "final_loss": round(loss, 3),
        "train_s": round(train_s, 1),
        "steps_per_s": round(args.steps / max(train_s, 1e-9), 2),
        "eval_s": round(eval_s, 1),
    })
    print(json.dumps(row), flush=True)
    return row


def run_mode_seg(mode, args, config, spec):
    """Per-mode seg sweep row: streaming train -> confusion-matrix eval.

    vehicle IoU (class 1) is the collaboration-sensitive number: occluded
    vehicles are present in the GT label map but absent from the ego
    point cloud, so only fusion can segment them.
    """
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.datasets.synthetic import generate_batch
    from v2x_sim_tpu.train.seg_module import SegModule
    from v2x_sim_tpu.utils.seg_metrics import iou_from_confusion

    drop = ("visible", "gt_vehicle")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    mod = SegModule(
        config, mode=mode, learning_rate=args.lr, width_mult=args.width_mult,
        depth=args.seg_depth,
    )
    raw0 = generate_batch(config, spec, batch_size=args.batch, seed=args.seed)
    state = mod.init(jax.random.PRNGKey(args.seed), to_dev(raw0))
    state, _ = mod.train_step(state, mod.prepare_batch(to_dev(raw0)))

    t0 = time.time()
    loss = float("nan")
    for s in range(args.steps):
        raw = generate_batch(
            config, spec, batch_size=args.batch, seed=10_000 + s
        )
        state, metrics = mod.train_step(state, mod.prepare_batch(to_dev(raw)))
        loss = metrics["loss"]
    loss = float(loss)
    train_s = time.time() - t0

    cm = None
    t0 = time.time()
    for e in range(args.eval_batches):
        raw = generate_batch(
            config, spec, batch_size=args.batch, seed=900_000 + e
        )
        _, c = mod.eval_step(state, mod.prepare_batch(to_dev(raw)))
        cm = np.asarray(c) if cm is None else cm + np.asarray(c)
    eval_s = time.time() - t0

    ious = iou_from_confusion(cm)
    row = {
        "mode": mode,
        "mIoU": round(ious["miou"], 4),
        "vehicle IoU": round(ious["iou_class1"], 4),
        "final_loss": round(loss, 3),
        "train_s": round(train_s, 1),
        "steps_per_s": round(args.steps / max(train_s, 1e-9), 2),
        "eval_s": round(eval_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def write_table(rows, args, path):
    lines = [
        "# Collaboration-mode benchmark (synthetic, per-agent occlusion)",
        "",
        f"Generated by `python -m v2x_sim_tpu.tools.bench_table "
        f"--task {args.task} --match {args.match} "
        f"--grid {args.grid} --steps {args.steps} --batch {args.batch} "
        f"--agents {args.agents} --occlusion {args.occlusion} "
        f"--width_mult {args.width_mult} --seed {args.seed}"
        + (f" --seg_depth {args.seg_depth}" if args.task == "seg" else "")
        + "`.",
        "",
        "Training data is streamed (fresh scenes per step); eval scenes are",
        f"held out ({args.eval_batches} batches, seeds 900k+). Occlusion "
        f"prob {args.occlusion}: each vehicle is independently dropped from "
        "each agent's point cloud, so a detector can only recover occluded "
        "vehicles through collaboration — the reference benchmark's premise "
        "(README.md:99-101).",
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
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    modes = ALL_MODES if args.modes == "all" else tuple(
        m.strip() for m in args.modes.split(",")
    )
    config = build_config(args)
    spec = build_spec(args)
    runner = run_mode_seg if args.task == "seg" else run_mode
    rows = [runner(m, args, config, spec) for m in modes]
    write_table(rows, args, args.out)


if __name__ == "__main__":
    main()
