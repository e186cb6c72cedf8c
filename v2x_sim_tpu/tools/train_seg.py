"""Segmentation training CLI (analog of † coperception/tools/seg/train_seg.py)."""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    from v2x_sim_tpu.tools.common import add_common_args

    add_common_args(p)
    p.add_argument("--nepoch", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batches_per_epoch", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()
    from v2x_sim_tpu.tools.common import (
        build_config,
        force_cpu_if_requested,
        make_batches,
        resolve_mode,
    )

    force_cpu_if_requested(args)
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from v2x_sim_tpu.train.seg_module import SegModule
    from v2x_sim_tpu.utils.meters import RunLogger, StepTimer

    config = build_config(args)
    import jax.numpy as _jnp

    module = SegModule(
        config,
        mode=resolve_mode(args),
        learning_rate=args.lr,
        compute_dtype=_jnp.bfloat16 if args.bf16 else _jnp.float32,
        width_mult=args.width_mult,
    )
    logger = RunLogger(args.logpath)
    logger.log(f"train_seg mode={resolve_mode(args)} args={vars(args)}")

    first = next(make_batches(args, config, num_batches=1))
    first = {k: jnp.asarray(v) for k, v in first.items() if k != "visible"}
    state = module.init(jax.random.PRNGKey(args.seed), first)
    start_epoch = 0
    if args.resume:
        path = args.resume if args.resume != "auto" else latest_checkpoint(args.logpath)
        if path:
            state = restore_checkpoint(path, state)
            start_epoch = int(state.step) // args.batches_per_epoch
            logger.log(f"resumed from {path}")

    timer = StepTimer(scenes_per_step=args.batch)
    for epoch in range(start_epoch, args.nepoch):
        for raw in make_batches(
            args, config, split_seed=epoch * 1000, num_batches=args.batches_per_epoch
        ):
            batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
            prepared = module.prepare_batch(batch)
            state, metrics = module.train_step(state, prepared)
            rate = timer.tick()
            vals = {k: float(v) for k, v in metrics.items()}
            if rate:
                vals["scenes_per_sec"] = rate
            logger.metrics(int(state.step), vals)
        logger.log(f"epoch {epoch}: loss={vals['loss']:.4f}")
        save_checkpoint(args.logpath, state, epoch)
    logger.close()


if __name__ == "__main__":
    main()
