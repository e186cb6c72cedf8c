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
import functools
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
    # The flagship: disco distilled against the trained upperbound
    # teacher (reference `--com disco --kd_flag 1`,
    # † coperception/tools/det/Makefile). Placed after upperbound so the
    # sweep reuses its trained state as the frozen teacher.
    "disco+kd",
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
        "--grid", default="tiny",
        choices=["tiny", "tiny1m", "small", "medium", "full"],
        help="tiny=32x32/2m (CPU-feasible), tiny1m=32x32/1m (vehicle "
        "footprints span cells — use for seg), small=64x64, "
        "medium=128x128/0.5m (production-bisection), full=256x256",
    )
    p.add_argument(
        "--seg_depth", type=int, default=4,
        help="UNet down/up stages (seg task only; reference = 4). The "
        "bottleneck — where fusion happens — sits at H/2^depth: use 2 at "
        "tiny grids so collaboration has resolution to transfer",
    )
    p.add_argument("--agents", type=int, default=2)
    p.add_argument("--occlusion", type=float, default=0.45)
    p.add_argument(
        "--lidar_range", type=float, default=0.0,
        help="per-agent LiDAR range in meters (0 = grid default: 40 at "
        "tiny, 20 elsewhere). range < extents is the production regime "
        "— far vehicles are only detectable through collaboration",
    )
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
    p.add_argument(
        "--kd_weight", type=float, default=1e5,
        help="disco+kd distillation weight (reference ~1e5 with mean-"
        "reduced MSE; # VERIFY vs reference)",
    )
    p.add_argument(
        "--warp_flag", type=int, default=1,
        help="when2com/who2com: warp requested neighbor features into "
        "the ego frame before mixing (reference --warp_flag ablation)",
    )
    p.add_argument(
        "--v2v_msg_norm", type=int, default=0,
        help="GroupNorm on v2v messages (models.det.v2vnet msg_norm — "
        "the V2V_DIAGNOSIS remediation); 0 matches the reference",
    )
    p.add_argument(
        "--row_suffix", default="",
        help="appended to the mode label in the table row and curves "
        "records — lets ablation runs (--warp_flag 0, --v2v_msg_norm 1, "
        "--v2v_rounds 1) land in a shared table without name collisions",
    )
    p.add_argument(
        "--v2v_rounds", type=int, default=3,
        help="V2VNet GNN message rounds (reference 3) — production-"
        "geometry convergence diagnostic knob",
    )
    p.add_argument(
        "--kd_reduce", default="mean", choices=["mean", "pos"],
        help="KD MSE normalization: per-element mean (reference "
        "F.mse_loss default) or global-positive-count (det-term-style)",
    )
    p.add_argument(
        "--kd_sweep", default="",
        help="comma list of WEIGHT[:REDUCE] specs (e.g. "
        "'1e3,1e4,1e5,1e4:pos'): the disco+kd mode expands into one row "
        "per spec, sharing the pool and teacher within one process — "
        "the PARITY.md #6 kd_weight ablation",
    )
    p.add_argument(
        "--teacher_state", default="",
        help="path to an upperbound <mode>_seed<seed>.pkl (from a prior "
        "--save_states run) to use as the frozen KD teacher instead of "
        "training one inline — makes kd_weight/kd_reduce ablations pay "
        "only the student's cost",
    )
    p.add_argument(
        "--grad_clip", type=float, default=0.0,
        help="global-norm gradient clip before Adam (reference FaFModule "
        "clips; 0 = off, matching the committed unclipped rows — "
        "docs/UPPERBOUND_DIAGNOSIS.md)",
    )
    p.add_argument(
        "--cosine", action="store_true",
        help="warmup+cosine-decay lr schedule over --steps (peak --lr, "
        "decay to 5%%): squeezes more convergence out of short budgets "
        "for the learned fusions; off by default so tables stay "
        "comparable with constant-lr runs",
    )
    p.add_argument(
        "--seeds", default=None,
        help="comma list of seeds; runs every mode per seed and reports "
        "mean +/- spread columns (overrides --seed)",
    )
    p.add_argument(
        "--data_pool", type=int, default=0,
        help="pre-generate this many training batches once and cycle "
        "them (a finite dataset with epochs, like the reference's; "
        "shared across modes so every row trains on identical scenes). "
        "0 = stream fresh scenes per step. At the full grid host-side "
        "generation is ~0.8 s/batch — 3x the device step — so pooling "
        "is what keeps the TPU busy",
    )
    p.add_argument(
        "--bake_pool", type=int, default=1,
        help="with --data_pool on the det task: run the anchor "
        "assignment ONCE per pool batch (the reference's offline "
        "create_data regime) and keep the pool device-resident, so the "
        "per-step cost is voxelize+step only — no per-step assignment, "
        "no per-step host->device transfer. 0 = raw host pool "
        "(round-3 behavior)",
    )
    p.add_argument(
        "--eval_at", default=None,
        help="comma list of intermediate step counts at which to run "
        "the held-out eval (mAP-vs-steps convergence curves). Eval time "
        "is excluded from train_s. Curves land in --curves_out",
    )
    p.add_argument(
        "--curves_out", default=None,
        help="JSONL path for per-mode/seed convergence curves "
        "(default: <--out stem>_curves.jsonl when --eval_at is set)",
    )
    p.add_argument(
        "--save_states", default="",
        help="dir to pickle each mode's trained (params, batch_stats) "
        "as <mode>_seed<seed>.pkl — downstream consumers (the tracking "
        "table sweep) re-evaluate these weights without retraining",
    )
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
    elif args.grid == "medium":
        grid = GridConfig(voxel_size=(0.5, 0.5, 0.5))
        layer = 3
    else:
        grid = GridConfig()
        layer = 3
    return Config(grid=grid, num_agents=args.agents, fusion_layer=layer)


def build_spec(args):
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec

    rng = getattr(args, "lidar_range", 0.0) or None
    if args.grid in ("tiny", "tiny1m"):
        return SyntheticSpec(
            num_vehicles=6, points_per_agent=512, max_gt=8,
            points_per_vehicle=48, occlusion_prob=args.occlusion,
            lidar_range=rng or (40.0 if args.grid == "tiny" else 20.0),
        )
    return SyntheticSpec(
        occlusion_prob=args.occlusion,
        **({"lidar_range": rng} if rng else {}),
    )


def _learning_rate(args):
    """Constant lr, or (--cosine) a warmup+cosine-decay schedule — optax
    schedules drop straight into optax.adam's learning_rate slot."""
    if not args.cosine:
        return args.lr
    import optax

    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.lr,
        warmup_steps=max(1, min(args.steps // 10, 200)),
        decay_steps=args.steps,
        end_value=args.lr * 0.05,
    )


def _train_seed_offset(seed: int) -> int:
    """Distinct training streams per seed (eval seeds 900k+ stay fixed so
    every seed/mode is scored on the SAME held-out scenes)."""
    return 10_000 + seed * 1_000_000


def _bake_pool_targets(pool, config):
    """Bake the sparse anchor assignment into every pool batch ONCE (the
    reference's offline create_data regime — SURVEY.md §3.1), storing the
    dense cls labels in compressed form: flat indices of the positive (1)
    and ignore (-1) anchors only. The dense (B, A, H*W*K) int8 label map
    is 19 MB/batch at the full grid — far too big to keep per pool entry
    on device — but it is ~zeros outside those two sparse sets, so a
    2-scatter reconstruction per step rebuilds it in HBM for free.

    Mutates each pool entry: adds tgt_cells/tgt_wts/tgt_reg (the sparse
    localization targets `DetModule.prepare_batch` consumes) plus
    pos_idx/ign_idx (padded with n = out-of-bounds, dropped on scatter).
    Returns n (flat anchor count) for the reconstruction closure.
    """
    import jax.numpy as jnp

    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.ops.assign import (
        _sparse_label_idx_jit,
        assign_targets_batched,
        label_counts,
        labels_from_sparse_idx,
    )

    anchors = jnp.asarray(anchor_grid(config))
    h, w, k, _ = anchors.shape
    n = h * w * k
    t0 = time.time()
    caps = None
    first_labels = None
    maxes = []
    for i, raw in enumerate(pool):
        if i % 50 == 0:
            print(f"baking pool targets {i}/{len(pool)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        b, a, m, _ = raw["gt_boxes"].shape
        sp = assign_targets_batched(
            jnp.asarray(raw["gt_boxes"].reshape(b * a, m, 5)),
            jnp.asarray(raw["gt_mask"].reshape(b * a, m)),
            anchors,
            config,
            flat="sparse",
        )
        raw["tgt_cells"] = jnp.reshape(sp.cells, (b, a) + sp.cells.shape[1:])
        # Pool-HBM dtypes: wts are {0,1} -> int8; reg deltas -> bf16
        # (<=0.4% rel err, ~2 cm on a 5 m box — invisible at IoU 0.7).
        # At the r5 grid-scaled 1024-cell capacity the f32 pool was
        # 14.5 MB/batch (8.7 GB at --data_pool 600) and OOM'd the third
        # mode of a sweep; this keeps the full pool ~6 GB. prepare_batch
        # casts back to f32 (DetModule accepts any float dtype there).
        raw["tgt_wts"] = jnp.reshape(
            sp.wts, (b, a) + sp.wts.shape[1:]).astype(jnp.int8)
        raw["tgt_reg"] = jnp.reshape(
            sp.reg, (b, a) + sp.reg.shape[1:]).astype(jnp.bfloat16)
        if caps is None:
            # Size the index capacity off the first batch (2x margin,
            # 128-lane rounded); per-batch overflow is asserted below.
            # Everything stays ON DEVICE: a dense-label pull is 19 MB per
            # batch over the (45 MB/s, ~3 min first-transfer) tunnel.
            counts = label_counts(sp.labels)
            caps = tuple(
                max(128, int(-(-2 * int(c) // 128) * 128)) for c in counts
            )
            first_labels = sp.labels  # parity-checked below (one pull)
        pos, ign, npos, nign = _sparse_label_idx_jit(*caps, n)(sp.labels)
        # Keep the overflow counters ON DEVICE during the loop (a per-batch
        # int() pull costs a ~2 s tunnel round trip x pool size); assert
        # once below, before any training consumes the indices.
        maxes.append((npos, nign))
        raw["pos_idx"] = pos.reshape(b, a, -1)
        raw["ign_idx"] = ign.reshape(b, a, -1)
    counts = np.asarray(jnp.stack([jnp.stack(m) for m in maxes]))  # one pull
    npos, nign = int(counts[:, 0].max()), int(counts[:, 1].max())
    assert npos <= caps[0] and nign <= caps[1], (
        f"pool label index capacity exceeded "
        f"(pos {npos}/{caps[0]}, ign {nign}/{caps[1]})"
    )
    b, a = pool[0]["agent_mask"].shape
    recon = np.asarray(
        labels_from_sparse_idx(pool[0]["pos_idx"], pool[0]["ign_idx"], n)
    ).reshape(b * a, n)
    assert np.array_equal(recon, np.asarray(first_labels)), (
        "sparse label reconstruction does not match the dense assignment"
    )
    print(f"pool targets baked ({time.time() - t0:.0f}s)", flush=True)
    return n


def _train_stream(args, config, spec, seed, shared):
    """Per-step training batch source: fresh scene per step, or a
    pre-generated pool cycled epoch-style (--data_pool), shared across
    modes so every table row trains on identical data.

    Pool batches live ON DEVICE (the full-grid pool is ~4 MB/batch once
    labels are stored sparse), so the steady-state step pays zero
    host->device transfer — the single host CPU core stays free to run
    evals/other work while the chip trains."""
    import jax.numpy as jnp

    from v2x_sim_tpu.datasets.synthetic import generate_batch

    off = _train_seed_offset(seed)
    if not args.data_pool:
        return lambda s: generate_batch(
            config, spec, batch_size=args.batch, seed=off + s
        )
    pkey = ("pool", seed)
    pool = shared.get(pkey) if shared is not None else None
    if pool is None:
        # Strip keys the training path never reads (to_dev drops them
        # anyway; seg_labels alone is 12.6 MB/batch at the full grid).
        strip = {"visible", "gt_vehicle"}
        if args.task != "seg":
            strip.add("seg_labels")
        t0 = time.time()
        pool = [
            {
                k: v
                for k, v in generate_batch(
                    config, spec, batch_size=args.batch, seed=off + i
                ).items()
                if k not in strip
            }
            for i in range(args.data_pool)
        ]
        print(f"pool generated ({time.time() - t0:.0f}s)", flush=True)
        if args.task == "det" and args.bake_pool:
            _bake_pool_targets(pool, config)
        for raw in pool:
            if "seg_labels" in raw:
                # 8 classes fit int8; int32 labels are 12.6 MB/batch at
                # the full grid — 4x the device-pool HBM for nothing.
                raw["seg_labels"] = np.asarray(raw["seg_labels"], np.int8)
        pool = [
            {k: jnp.asarray(v) for k, v in raw.items()} for raw in pool
        ]
        if shared is not None:
            shared[pkey] = pool
    if args.task == "det" and args.bake_pool:
        # prepare_batch reconstructs dense labels on device from the
        # sparse indices (ops.assign.labels_from_sparse_idx) — just
        # rename the pool keys to the cache wire format it consumes.
        def fetch(s):
            e = pool[s % len(pool)]
            batch = {
                k: v for k, v in e.items() if k not in ("pos_idx", "ign_idx")
            }
            batch["tgt_pos_idx"] = e["pos_idx"]
            batch["tgt_ign_idx"] = e["ign_idx"]
            return batch

        return fetch
    return lambda s: pool[s % len(pool)]


def run_mode(mode, args, config, spec, shared=None, seed=None):
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.datasets.synthetic import generate_batch
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    seed = args.seed if seed is None else seed
    # seg_labels is dead weight on the det path (12.6 MB/batch at the
    # full grid — pure transfer waste over the tunnel).
    drop = ("visible", "gt_vehicle", "seg_labels")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    stream = _train_stream(args, config, spec, seed, shared)
    kd = mode == "disco+kd"
    mod = DetModule(
        config,
        mode="disco" if kd else mode,
        learning_rate=_learning_rate(args),
        width_mult=args.width_mult,
        kd_weight=args.kd_weight if kd else 0.0,
        kd_reduce=args.kd_reduce,
        v2v_rounds=args.v2v_rounds,
        v2v_msg_norm=bool(getattr(args, "v2v_msg_norm", 0)),
        warp_flag=bool(args.warp_flag),
        grad_clip=getattr(args, "grad_clip", 0.0),
    )
    raw0 = generate_batch(config, spec, batch_size=args.batch, seed=seed)
    state = mod.init(jax.random.PRNGKey(seed), to_dev(raw0))

    # Flagship KD config: distill against the trained early-fusion
    # upperbound (reference `--kd_flag 1` teacher provenance). Reuse the
    # sweep's own upperbound run when it came first (deterministic: the
    # inline loop below replays the identical init + warmup + steps);
    # otherwise train one now, timed separately as teacher_s — the
    # reference's teacher is likewise pretrained offline.
    targs = ()
    teacher_s = 0.0
    if kd:
        tkey = ("teacher", seed)
        teacher_vars = shared.get(tkey) if shared is not None else None
        if teacher_vars is None and args.teacher_state:
            import pickle

            import jax.numpy as _jnp

            with open(args.teacher_state, "rb") as f:
                blob = pickle.load(f)
            teacher_vars = jax.tree.map(_jnp.asarray, {
                "params": blob["params"], "batch_stats": blob["batch_stats"]
            })
            if shared is not None:
                shared[tkey] = teacher_vars
        if teacher_vars is None:
            tt0 = time.time()
            t_mod = DetModule(
                config, mode="upperbound", learning_rate=_learning_rate(args),
                width_mult=args.width_mult,
            )
            t_state = t_mod.init(jax.random.PRNGKey(seed), to_dev(raw0))
            # Same raw0 warmup step the upperbound table row takes before
            # its timed loop, so the teacher state is identical whether it
            # was trained here or reused from a preceding upperbound row.
            t_state, _ = t_mod.train_step(t_state, t_mod.prepare_batch(to_dev(raw0)))
            for s in range(args.steps):
                t_state, _ = t_mod.train_step(
                    t_state, t_mod.prepare_batch(to_dev(stream(s)))
                )
            teacher_vars = {
                "params": t_state.params, "batch_stats": t_state.batch_stats
            }
            if shared is not None:
                shared[tkey] = teacher_vars
            jax.block_until_ready(teacher_vars["params"])
            teacher_s = time.time() - tt0
        targs = (teacher_vars,)

    thresholds = tuple(
        float(t) for t in (
            args.thresholds.split(",") if args.thresholds
            else ("1.0", "2.0") if args.match == "center" else ("0.5", "0.7")
        )
    )

    def eval_batch(e):
        """Held-out eval batch `e` — generated once per process and
        reused across modes/seeds/milestones (host generation is
        ~0.8 s/batch at the full grid; the eval seeds are fixed, so
        regenerating per eval was pure waste)."""
        key = ("eval", e)
        if shared is None:
            return generate_batch(
                config, spec, batch_size=args.batch, seed=900_000 + e
            )
        if key not in shared:
            shared[key] = generate_batch(
                config, spec, batch_size=args.batch, seed=900_000 + e
            )
        return shared[key]

    def evaluate(state):
        """Held-out eval -> ({mAP@t: v}, eval_s). predict consumes the raw
        batch directly (it voxelizes itself); prepare_batch would add a
        full anchor-assignment pass that eval never reads."""
        det_b, det_s, det_v, gt_b, gt_m, am = [], [], [], [], [], []
        t0 = time.time()
        for e in range(args.eval_batches):
            raw = eval_batch(e)
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
        return (
            {f"mAP@{t}{unit}": round(maps[f"mAP@{t}{unit}"], 4)
             for t in thresholds},
            eval_s,
        )

    # Warmup step: absorb the jit compile (reported as compile_s) so
    # train_s / steps_per_s measure steady-state throughput, comparable
    # across modes (round-1 table had the first mode 15x "slower" purely
    # from a cold compile cache).
    t0 = time.time()
    state, m0 = mod.train_step(state, mod.prepare_batch(to_dev(raw0)), *targs)
    jax.block_until_ready(m0["loss"])
    compile_s = time.time() - t0

    # Train in segments split at the --eval_at milestones; eval wall time
    # stays out of train_s, so steps_per_s is the steady training rate.
    milestones = sorted(
        {int(x) for x in args.eval_at.split(",")} if args.eval_at else set()
    )
    segments = [m for m in milestones if m < args.steps] + [args.steps]
    curve = []
    train_s = 0.0
    loss = float("nan")
    done = 0
    for seg_end in segments:
        t0 = time.time()
        metrics = None
        for s in range(done, seg_end):
            state, metrics = mod.train_step(
                state, mod.prepare_batch(to_dev(stream(s))), *targs
            )
        # Task loss (cls+loc) only: the KD term is scaled by kd_weight
        # (1e5 by default), so including it would make the final_loss
        # column incomparable across rows (VERDICT r3 "disco+kd
        # bookkeeping"). Computed once per segment, outside the timed
        # loop — an eager per-step add dispatches a device op inside the
        # throughput measurement (r4 advisor, bench_table.py:538).
        if metrics is not None:
            loss = metrics["cls_loss"] + metrics["loc_loss"]
        jax.block_until_ready(loss)
        train_s += time.time() - t0
        done = seg_end
        maps_now, eval_s = evaluate(state)
        curve.append(dict(step=seg_end, loss=round(float(loss), 3), **maps_now))
        print(f"  {mode} @ {seg_end}: {curve[-1]}", flush=True)
    loss = float(loss)

    if mode == "upperbound" and shared is not None:
        shared[("teacher", seed)] = {
            "params": state.params, "batch_stats": state.batch_stats
        }

    if args.save_states:
        import pickle

        os.makedirs(args.save_states, exist_ok=True)
        blob = jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        with open(
            os.path.join(args.save_states, f"{mode}_seed{seed}.pkl"), "wb"
        ) as f:
            pickle.dump(blob, f)

    row = {"mode": mode + getattr(args, "row_suffix", "")}
    row.update(curve[-1])
    del row["step"], row["loss"]
    row.update({
        "final_loss": round(loss, 3),
        "train_s": round(train_s, 1),
        "steps_per_s": round(args.steps / max(train_s, 1e-9), 2),
        "compile_s": round(compile_s, 1),
        "teacher_s": round(teacher_s, 1),
        "eval_s": round(eval_s, 1),
    })
    print(json.dumps(row), flush=True)
    if args.curves_path:
        rec = {
            "mode": mode + getattr(args, "row_suffix", ""),
            "seed": seed,
            "curve": curve,
        }
        if kd:
            rec["kd_weight"] = args.kd_weight
            rec["kd_reduce"] = args.kd_reduce
        with open(args.curves_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return row


def run_mode_seg(mode, args, config, spec, shared=None, seed=None):
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

    seed = args.seed if seed is None else seed
    drop = ("visible", "gt_vehicle")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    mod = SegModule(
        config, mode=mode, learning_rate=_learning_rate(args), width_mult=args.width_mult,
        depth=args.seg_depth,
    )
    raw0 = generate_batch(config, spec, batch_size=args.batch, seed=seed)
    state = mod.init(jax.random.PRNGKey(seed), to_dev(raw0))
    state, _ = mod.train_step(state, mod.prepare_batch(to_dev(raw0)))

    stream = _train_stream(args, config, spec, seed, shared)
    t0 = time.time()
    loss = float("nan")
    for s in range(args.steps):
        state, metrics = mod.train_step(
            state, mod.prepare_batch(to_dev(stream(s)))
        )
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
        "mode": mode + getattr(args, "row_suffix", ""),
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
        f"--width_mult {args.width_mult} "
        + (f"--seeds {args.seeds}" if args.seeds else f"--seed {args.seed}")
        + (f" --seg_depth {args.seg_depth}" if args.task == "seg" else "")
        + (f" --data_pool {args.data_pool}" if args.data_pool else "")
        + (" --cosine" if args.cosine else "")
        + (f" --eval_at {args.eval_at}" if args.eval_at else "")
        + "`.",
        "",
        "**Absolute numbers are NOT comparable to the reference's "
        "published tables**: these rows train from scratch for a short "
        "synthetic-data budget (the reference trains ~100 epochs on the "
        "real V2X-Sim dataset), so absolute mAP/mIoU levels are far below "
        "the published ~0.45-0.70 range. The *ordering and gaps between "
        "rows* — trained and evaluated identically — are the signal.",
        "",
        (
            f"Training data is a fixed pool of {args.data_pool} batches "
            "cycled epoch-style, identical across modes/rows"
            if args.data_pool
            else "Training data is streamed (fresh scenes per step)"
        )
        + "; eval scenes are",
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


def aggregate_seeds(per_seed):
    """Fold one mode's per-seed rows into mean ± std cells."""
    import numpy as _np

    row = {"mode": per_seed[0]["mode"]}
    for k in per_seed[0]:
        if k == "mode":
            continue
        vals = _np.asarray([r[k] for r in per_seed], dtype=float)
        row[k] = f"{vals.mean():.4g}±{vals.std():.2g}"
    return row


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    args.curves_path = None
    if args.eval_at:
        args.curves_path = args.curves_out or (
            os.path.splitext(args.out)[0] + "_curves.jsonl"
        )
        open(args.curves_path, "w").close()  # fresh file per sweep
    modes = ALL_MODES if args.modes == "all" else tuple(
        m.strip() for m in args.modes.split(",")
    )
    if args.task == "seg":
        modes = tuple(m for m in modes if m != "disco+kd")
    seeds = (
        [int(s) for s in args.seeds.split(",")] if args.seeds else [args.seed]
    )
    config = build_config(args)
    spec = build_spec(args)
    runner = run_mode_seg if args.task == "seg" else run_mode
    shared = {}
    rows = []
    for m in modes:
        variants = [(m, args)]
        if m == "disco+kd" and args.kd_sweep and args.task == "det":
            variants = []
            for spec_str in args.kd_sweep.split(","):
                w, _, red = spec_str.strip().partition(":")
                a2 = argparse.Namespace(**vars(args))
                a2.kd_weight = float(w)
                a2.kd_reduce = red or "mean"
                a2.save_states = ""  # one file per mode name — ambiguous
                variants.append((f"disco+kd[{w},{a2.kd_reduce}]", a2))
        for label, a in variants:
            per_seed = [
                runner(m, a, config, spec, shared, seed=s) for s in seeds
            ]
            # Drop per-mode compiled executables (each mode builds fresh
            # jitted closures; their cache entries pin device buffers
            # between modes — sweep-scale HBM hygiene).
            import jax as _jax

            _jax.clear_caches()
            row = (
                aggregate_seeds(per_seed) if len(seeds) > 1 else per_seed[0]
            )
            row["mode"] = label
            rows.append(row)
    write_table(rows, args, args.out)


if __name__ == "__main__":
    main()
