"""Upperbound-at-production-geometry diagnostic (VERDICT r4 missing #1).

At 256x256 / width 1.0 the early-fusion upperbound — the reference's
benchmark *ceiling* (/root/reference/README.md:30-36) — scored 0.114
mAP@0.5 at 12000 steps, BELOW the no-collaboration lowerbound (0.137),
with a nearly flat loss curve, while being the clear ceiling at CI scale
and in production seg. This tool separates the candidate root causes the
way tools/diag_v2v separated "budget" from "numerical" for v2v:

  * BN train/eval gap — held-out loss under running stats (train=False)
    vs batch stats (train=True): a large gap means the merged-occupancy
    input makes BatchNorm running statistics unrepresentative.
  * pool overfitting — mAP on training-pool scenes vs held-out scenes:
    a large gap means the 6x-denser merged input lets the model
    memorize the finite pool instead of generalizing.
  * optimization (lr mis-sizing) — train-loss trajectory + gradient
    global norm per probe; compare across --lr / --cosine settings.
  * score pathology — mean predicted vehicle probability at positive vs
    background anchors, and the count of above-NMS-threshold anchors:
    a detector whose loss falls while mAP stays flat usually shows it
    here (uniformly low positive scores, or background score mass
    flooding the top-K).

Probes run for every mode in --modes (default: upperbound + lowerbound
+ disco as healthy/unhealthy controls) under the exact bench_table pool
regime (same generator, same baked sparse targets, same schedule).

Usage (TPU, ~10 min/mode at the defaults):
  python -m v2x_sim_tpu.tools.diag_upperbound --steps 3000 \
      --probe_every 500 --data_pool 150 --cosine --out /tmp/diag_ub.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--modes", default="upperbound,lowerbound,disco")
    p.add_argument("--grid", default="full",
                   choices=["tiny", "tiny1m", "small", "medium", "full"])
    p.add_argument("--agents", type=int, default=6)
    p.add_argument("--width_mult", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--probe_every", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--cosine", action="store_true")
    p.add_argument("--grad_clip", type=float, default=0.0)
    p.add_argument("--occlusion", type=float, default=0.45)
    p.add_argument("--lidar_range", type=float, default=0.0,
                   help="see bench_table --lidar_range")
    p.add_argument("--data_pool", type=int, default=150)
    p.add_argument("--bake_pool", type=int, default=1)
    p.add_argument("--task", default="det")  # _train_stream contract
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_batches", type=int, default=3)
    p.add_argument("--score_threshold", type=float, default=0.05)
    p.add_argument("--nms_iou", type=float, default=0.1)
    p.add_argument("--max_boxes", type=int, default=16)
    p.add_argument("--out", default="/tmp/diag_upperbound.jsonl")
    p.add_argument(
        "--arms", default="",
        help="semicolon list of LR:CLIP:SCHED arms (SCHED in "
        "{const,cosine}), e.g. '3e-3:0:const;1e-3:0:const;"
        "3e-3:1.0:const'. Each arm trains every --modes mode with that "
        "optimizer config, sharing the pool — the remediation sweep "
        "for the held-out-loc instability (UPPERBOUND_DIAGNOSIS.md). "
        "Empty = single arm from --lr/--cosine/--grad_clip",
    )
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
    from v2x_sim_tpu.tools.bench_table import (
        _learning_rate,
        _train_stream,
        build_config,
        build_spec,
    )
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    enable_compilation_cache()
    config = build_config(args)
    spec = build_spec(args)
    shared = {}
    drop = ("visible", "gt_vehicle", "seg_labels")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    held = [
        generate_batch(config, spec, batch_size=args.batch, seed=900_000 + e)
        for e in range(args.eval_batches)
    ]

    open(args.out, "w").close()

    def emit(rec):
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if args.arms:
        arms = []
        for arm_spec in args.arms.split(";"):
            lr, clip, sched = arm_spec.strip().split(":")
            arms.append((float(lr), float(clip), sched))
    else:
        arms = [(args.lr, args.grad_clip, "cosine" if args.cosine else "const")]

    import argparse as _ap

    for arm_lr, arm_clip, arm_sched in arms:
        a = _ap.Namespace(**vars(args))
        a.lr, a.grad_clip, a.cosine = arm_lr, arm_clip, arm_sched == "cosine"
        arm_tag = (
            f"@lr={arm_lr:g},clip={arm_clip:g},{arm_sched}"
            if args.arms else ""
        )
        run_modes(args.modes, a, arm_tag, config, spec, shared, held, emit)


def run_modes(modes, args, arm_tag, config, spec, shared, held, emit):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.datasets.synthetic import generate_batch
    from v2x_sim_tpu.tools.bench_table import _learning_rate, _train_stream
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    drop = ("visible", "gt_vehicle", "seg_labels")

    def to_dev(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k not in drop}

    for mode in modes.split(","):
        mode = mode.strip()
        mod = DetModule(
            config, mode=mode, learning_rate=_learning_rate(args),
            width_mult=args.width_mult, grad_clip=args.grad_clip,
        )
        raw0 = generate_batch(config, spec, batch_size=args.batch, seed=args.seed)
        state = mod.init(jax.random.PRNGKey(args.seed), to_dev(raw0))
        stream = _train_stream(args, config, spec, args.seed, shared)

        # Held-out probe batches, fully prepared once (targets + occupancy).
        held_prep = [mod.prepare_batch(to_dev(h)) for h in held]

        eval_loss = jax.jit(
            lambda p, s, b: mod.loss_fn(p, s, b, None, False)[1][1]
        )
        train_loss = jax.jit(
            lambda p, s, b: mod.loss_fn(p, s, b, None, True)[1][1]
        )

        def grad_norm_fn(p, s, b):
            import optax

            g = jax.grad(lambda pp: mod.loss_fn(pp, s, b, None, True)[0])(p)
            out = {"grad_norm": optax.global_norm(g)}
            # Per-subtree norms: a mode that learns slowly because its
            # HEAD gradients vanish looks very different from one whose
            # encoder gradients do.
            for key in ("encoder", "decoder", "cls_head", "reg_head"):
                if key in g:
                    out[f"g_{key}"] = optax.global_norm(g[key])
            return out

        grad_norm = jax.jit(grad_norm_fn)

        def score_stats_fn(p, s, b):
            """Anchor-level predicted-probability stats on a prepared
            batch, eval mode (running stats). Uses the blocked training
            heads + the focal fast path's channel folding so logits and
            the prepared (blocked-flat) labels align exactly."""
            out = mod.model.apply(
                {"params": p, "batch_stats": s},
                b["occupancy"], b["trans"], b["agent_mask"], train=False,
            )
            bsz, a = b["agent_mask"].shape
            x = out.cls_logits.reshape(bsz, a, -1).astype(jnp.float32)
            x0, x1 = x[..., 0::2], x[..., 1::2]
            p1 = jnp.exp(x1 - jnp.logaddexp(x0, x1))
            l = b["labels"].reshape(bsz, a, -1)
            pos, bg = (l > 0), (l == 0)
            npos = jnp.maximum(jnp.sum(pos), 1)
            nbg = jnp.maximum(jnp.sum(bg), 1)
            return {
                "pos_p_mean": jnp.sum(p1 * pos) / npos,
                "pos_p_max": jnp.max(jnp.where(pos, p1, 0.0)),
                "bg_p_mean": jnp.sum(p1 * bg) / nbg,
                "bg_p_max": jnp.max(jnp.where(bg, p1, 0.0)),
                "n_above_thr": jnp.sum(p1 > args.score_threshold)
                / (bsz * a),
                "n_pos_above_thr": jnp.sum((p1 > args.score_threshold) & pos)
                / (bsz * a),
            }

        score_stats = jax.jit(score_stats_fn)

        def eval_map(batches_raw):
            det_b, det_s, det_v, gt_b, gt_m, am = [], [], [], [], [], []
            for raw in batches_raw:
                res = mod.predict(
                    state, to_dev(raw) if not isinstance(
                        raw.get("points"), jnp.ndarray) else raw,
                    args.max_boxes, args.nms_iou, args.score_threshold,
                )
                det_b.append(np.asarray(res.boxes))
                det_s.append(np.asarray(res.scores))
                det_v.append(np.asarray(res.valid))
                gt_b.append(np.asarray(raw["gt_boxes"]))
                gt_m.append(np.asarray(raw["gt_mask"]))
                am.append(np.asarray(raw["agent_mask"]))
            maps = eval_map_agents(
                np.concatenate(det_b), np.concatenate(det_s),
                np.concatenate(det_v), np.concatenate(gt_b),
                np.concatenate(gt_m), np.concatenate(am),
                iou_thresholds=(0.5,), match="iou",
            )
            return float(maps["mAP@0.5"])

        pool_probe = [stream(s) for s in range(2)]  # training scenes

        def probe(step, last_metrics):
            rec = {"mode": mode + arm_tag, "step": step}
            if last_metrics is not None:
                rec["train_cls"] = round(float(last_metrics["cls_loss"]), 4)
                rec["train_loc"] = round(float(last_metrics["loc_loss"]), 4)
            # Held-out loss, running stats vs batch stats (BN gap).
            ev = [eval_loss(state.params, state.batch_stats, b)
                  for b in held_prep]
            tv = [train_loss(state.params, state.batch_stats, b)
                  for b in held_prep]
            for key in ("cls_loss", "loc_loss"):
                rec[f"held_{key}_run"] = round(
                    float(np.mean([float(m[key]) for m in ev])), 4)
                rec[f"held_{key}_bat"] = round(
                    float(np.mean([float(m[key]) for m in tv])), 4)
            gn = grad_norm(state.params, state.batch_stats, held_prep[0])
            rec.update({k: round(float(v), 3) for k, v in gn.items()})
            ss = score_stats(state.params, state.batch_stats, held_prep[0])
            rec.update({k: round(float(v), 4) for k, v in ss.items()})
            rec["map_held"] = round(eval_map(held), 4)
            rec["map_pool"] = round(eval_map(pool_probe), 4)
            emit(rec)

        t0 = time.time()
        metrics = None
        probe(0, None)
        for s in range(args.steps):
            state, metrics = mod.train_step(
                state, mod.prepare_batch(to_dev(stream(s)))
            )
            if (s + 1) % args.probe_every == 0 or s + 1 == args.steps:
                jax.block_until_ready(metrics["loss"])
                probe(s + 1, metrics)
        print(f"{mode} done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
