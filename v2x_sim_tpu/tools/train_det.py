"""Detection training CLI.

Analog of † coperception/tools/det/train_codet.py (SURVEY.md §2.2/§3.2):
`python -m v2x_sim_tpu.tools.train_det --com disco --kd_flag 1 ...`
with the reference's flag names, Adam, per-epoch checkpoints, and a
log.txt in the run directory — plus structured JSONL metrics and
scenes/sec tracking (SURVEY.md §5).
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    from v2x_sim_tpu.tools.common import add_common_args

    add_common_args(p)
    p.add_argument("--nepoch", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--grad_clip", type=float, default=0.0,
        help="global-norm gradient clip before Adam (reference FaFModule"
        " clips between backward and step; 0 = off)",
    )
    p.add_argument("--kd_flag", type=int, default=0)
    p.add_argument("--kd_weight", type=float, default=1e5)
    p.add_argument(
        "--teacher", default="", help="checkpoint of the early-fusion teacher"
    )
    p.add_argument("--MGDA", dest="mgda", action="store_true")
    p.add_argument("--batches_per_epoch", type=int, default=8)
    p.add_argument("--dp", type=int, default=0, help="data-parallel devices (0=single)")
    p.add_argument(
        "--log_every", type=int, default=20,
        help="materialize metrics on host every N steps (and on the last "
        "step of each epoch). Each materialization is a device sync — "
        "per-step logging throttles training to the host round-trip "
        "latency; 1 restores the reference's per-batch logging",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from v2x_sim_tpu.tools.common import (
        build_config,
        force_cpu_if_requested,
        make_batches,
        resolve_mode,
        strip_stale_targets,
    )

    force_cpu_if_requested(args)
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.meters import RunLogger, StepTimer

    config = build_config(args)
    mode = resolve_mode(args)
    kd_weight = args.kd_weight if args.kd_flag else 0.0

    logger = RunLogger(args.logpath)
    logger.log(f"train_det mode={mode} grid={config.grid.grid_shape} args={vars(args)}")

    dp = args.dp
    axis = None
    mesh = None
    if dp:
        from v2x_sim_tpu.parallel.mesh import DATA_AXIS, make_mesh

        axis = DATA_AXIS
        mesh = make_mesh(num_devices=dp)

    import jax.numpy as _jnp

    module = DetModule(
        config,
        mode=mode,
        learning_rate=args.lr,
        kd_weight=kd_weight,
        mgda=args.mgda,
        axis_name=axis,
        compute_dtype=_jnp.bfloat16 if args.bf16 else _jnp.float32,
        use_vis=bool(args.use_vis),
        warp_flag=bool(args.warp_flag),
        width_mult=args.width_mult,
        grad_clip=args.grad_clip,
    )

    first = strip_stale_targets(
        next(make_batches(args, config, num_batches=1)), config
    )
    first = {k: jnp.asarray(v) for k, v in first.items() if k != "visible"}
    state = module.init(jax.random.PRNGKey(args.seed), first)

    teacher_vars = None
    if kd_weight > 0.0:
        t_occ = module.merged_occupancy(
            first["points"], first["point_mask"], first["trans"], first["agent_mask"]
        )
        teacher_vars = module.teacher.init(
            jax.random.PRNGKey(args.seed + 1), t_occ, train=False
        )
        if args.teacher:
            from v2x_sim_tpu.train.checkpoint import restore_teacher

            # Accepts an upperbound run's epoch_N checkpoint directly
            # (the reference's TeacherNet provenance) or a bare
            # variables dict.
            teacher_vars = restore_teacher(args.teacher, teacher_vars, module.tx)
            logger.log(f"loaded teacher from {args.teacher}")

    start_epoch = 0
    if args.resume:
        path = args.resume if args.resume != "auto" else latest_checkpoint(args.logpath)
        if path:
            state = restore_checkpoint(path, state)
            start_epoch = int(state.step) // args.batches_per_epoch
            logger.log(f"resumed from {path} at epoch {start_epoch}")

    train_step = module.train_step
    prepare = module.prepare_batch
    if mesh is not None:
        from v2x_sim_tpu.parallel.mesh import (
            make_parallel_prepare,
            make_parallel_train_step,
            replicate,
            shard_batch,
        )

        state = replicate(state, mesh)
        if teacher_vars is not None:
            # Replicate once up front: otherwise jit re-shards the whole
            # teacher tree every step (and committed leaves crash with a
            # device mismatch under --dp N --kd_flag 1).
            teacher_vars = replicate(teacher_vars, mesh)
        train_step = make_parallel_train_step(module, mesh)
        prepare = make_parallel_prepare(module, mesh)

    from v2x_sim_tpu.datasets.loader import device_prefetch

    def dev_stage(raw):
        """Host batch -> device-prepared batch, run inside the prefetch
        thread (datasets.loader.device_prefetch) so the host->device
        transfer + prepare dispatch of batch N+1 overlap batch N's step
        (the r4 disk pipeline serialized them — BENCH_r04 51.2 vs 84.7
        scenes/sec; docs/PERF.md round-5 decomposition)."""
        raw = strip_stale_targets(raw, config)
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        return prepare(batch)

    timer = StepTimer(scenes_per_step=args.batch)
    for epoch in range(start_epoch, args.nepoch):
        for bi, prepared in enumerate(
            device_prefetch(
                make_batches(
                    args,
                    config,
                    split_seed=epoch * 1000,
                    num_batches=args.batches_per_epoch,
                ),
                dev_stage,
            )
        ):
            if kd_weight > 0.0:
                state, metrics = train_step(state, prepared, teacher_vars)
            else:
                state, metrics = train_step(state, prepared)
            rate = timer.tick()
            # Materialize metrics only every --log_every steps: float()
            # is a device sync, and per-step syncing caps throughput at
            # the host round-trip latency (the steps in between stay
            # queued on device, driven by the donated-state chain).
            if bi % max(1, args.log_every) == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                if rate:
                    vals["scenes_per_sec"] = rate
                logger.metrics(int(state.step), vals)
        # End-of-epoch sync: the source may yield fewer batches than
        # --batches_per_epoch, so materialize from the last metrics here.
        vals = {k: float(v) for k, v in metrics.items()}
        logger.metrics(int(state.step), vals)
        logger.log(
            f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in vals.items())
        )
        ckpt = save_checkpoint(args.logpath, state, epoch)
        logger.log(f"saved {ckpt}")
    logger.close()


if __name__ == "__main__":
    main()
