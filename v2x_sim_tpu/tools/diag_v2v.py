"""V2VNet numerical-health diagnostic (VERDICT r3 weak #1).

At production geometry v2v landed below when2com and barely above
lowerbound while being best-in-class at CI scale. This tool separates
"needs more budget" from "numerical issue at full width/geometry": it
trains v2v for --steps and, every --probe_every steps, captures the
ConvGRU gate statistics sown by models.convrnn.ConvGRUCell (update-gate
mean, saturation fractions, candidate/hidden/input magnitudes, one row
per GNN round) plus the training loss. Healthy training shows gates off
the rails (sat fractions << 1) and hidden-state magnitudes stable over
rounds; saturation -> the root cause is numerical, not budget.

Usage:
  python -m v2x_sim_tpu.tools.diag_v2v --grid full --agents 6 \
      --steps 600 --probe_every 100            # TPU
  python -m v2x_sim_tpu.tools.diag_v2v --cpu --grid tiny --agents 2 \
      --width_mult 0.25 --steps 60 --probe_every 20
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid", default="full",
                   choices=["tiny", "tiny1m", "small", "medium", "full"])
    p.add_argument("--agents", type=int, default=6)
    p.add_argument("--width_mult", type=float, default=1.0)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--probe_every", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--occlusion", type=float, default=0.45)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.datasets.synthetic import generate_batch
    from v2x_sim_tpu.tools.bench_table import build_config, build_spec
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()
    config = build_config(args)
    spec = build_spec(args)
    mod = DetModule(
        config, mode="v2v", learning_rate=args.lr,
        width_mult=args.width_mult, v2v_rounds=args.rounds,
    )

    def to_dev(raw):
        drop = ("visible", "gt_vehicle", "seg_labels")
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    raw0 = generate_batch(config, spec, batch_size=args.batch, seed=args.seed)
    state = mod.init(jax.random.PRNGKey(args.seed), to_dev(raw0))
    probe = to_dev(
        generate_batch(config, spec, batch_size=args.batch, seed=990_000)
    )
    probe_occ = mod.occupancy_from_points(
        probe["points"], probe["point_mask"]
    )

    @jax.jit
    def gru_probe(params, batch_stats):
        """One blocked-model forward with the diagnostics collection
        mutable: returns (rounds, 7) gate stats."""
        _, diag = mod.model.apply(
            {"params": params, "batch_stats": batch_stats},
            probe_occ,
            probe["trans"],
            probe["agent_mask"],
            train=False,
            mutable=["diagnostics"],
        )
        rows = jax.tree.leaves(diag["diagnostics"])
        return jnp.stack(rows)

    cols = ["z_mean", "z_sat_hi", "z_sat_lo", "r_mean", "|tanh(cand)|",
            "|h|", "|x|"]
    loss = float("nan")
    for s in range(args.steps + 1):
        if s % args.probe_every == 0:
            stats = np.asarray(gru_probe(state.params, state.batch_stats))
            print(json.dumps({
                "step": s,
                "loss": None if s == 0 else round(float(loss), 4),
                "gru_rounds": [
                    {c: round(float(v), 4) for c, v in zip(cols, row)}
                    for row in stats
                ],
            }), flush=True)
        if s == args.steps:
            break
        raw = generate_batch(
            config, spec, batch_size=args.batch, seed=10_000 + s
        )
        state, metrics = mod.train_step(
            state, mod.prepare_batch(to_dev(raw))
        )
        loss = metrics["loss"]


if __name__ == "__main__":
    main()
