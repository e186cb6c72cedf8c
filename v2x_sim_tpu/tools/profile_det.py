"""Cumulative stage budget for the flagship inference pipeline.

Times the e2e predict path in cumulative slices (vox, +encoder, +fusion,
+decoder, +heads, +decode, +NMS) at production geometry on the real
chip. Methodology matches bench.py / docs/PERF.md: each step's input
depends on the previous step's scalar carry, so the axon tunnel cannot
overlap or drop executions, and the clock stops on a host fetch of the
final carry. Per-stage cost = difference of adjacent cumulative rows.

Usage:
    python -m v2x_sim_tpu.tools.profile_det [--batch 16] [--steps 10]
        [--mode disco] [--train 0]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", default="disco")
    ap.add_argument("--train", type=int, default=0,
                    help="also time prepare_batch/train_step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    from v2x_sim_tpu.configs.config import Config
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.models.backbone import fold_agents, unfold_agents
    from v2x_sim_tpu.ops.postprocess import decode_topk_blocked
    from v2x_sim_tpu.ops.nms import batched_nms
    from v2x_sim_tpu.train.det_module import DetModule

    cfg = Config()
    spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
    raw = generate_batch(cfg, spec, batch_size=args.batch, seed=0)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

    module = DetModule(cfg, mode=args.mode, compute_dtype=jnp.bfloat16)
    state = module.init(jax.random.PRNGKey(0), batch)
    model = module.model
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pm, tr, am = batch["point_mask"], batch["trans"], batch["agent_mask"]
    collab = args.mode not in ("lowerbound", "upperbound")

    pre_blocked = module._occ_blocked

    def run_encoder(m, x):
        return m.encoder(fold_agents(x), False, pre_blocked=pre_blocked)

    def run_fused(m, x):
        feats = list(
            m.encoder(fold_agents(x), False, pre_blocked=pre_blocked)
        )
        if collab:
            f = unfold_agents(feats[m._layer], x.shape[1])
            feats[m._layer] = fold_agents(m._fuse(f, tr, am, False))
        return feats

    def run_decoder(m, x):
        return m.decoder(run_fused(m, x), False)

    def s_vox(p):
        # Match the production input path: upperbound runs on the
        # MERGED-cloud occupancy (its transform+merge cost belongs in the
        # vox stage), everything else on per-agent occupancy.
        if module.mode == "upperbound":
            occ = module.merged_occupancy(p, pm, tr, am)
        else:
            occ = module.occupancy_from_points(p, pm)
        return [occ]

    def s_enc(p):
        return model.apply(variables, s_vox(p)[0], method=run_encoder)

    def s_fuse(p):
        return model.apply(variables, s_vox(p)[0], method=run_fused)

    def s_dec(p):
        return [model.apply(variables, s_vox(p)[0], method=run_decoder)]

    def s_heads(p):
        out = model.apply(variables, s_vox(p)[0], tr, am, train=False)
        return [out.cls_logits, out.reg]

    def s_decode(p):
        out = model.apply(variables, s_vox(p)[0], tr, am, train=False)
        return list(decode_topk_blocked(
            out.cls_logits, out.reg, cfg, 128, 0.3, am))

    def s_nms(p):
        out = model.apply(variables, s_vox(p)[0], tr, am, train=False)
        boxes, scores, valid = decode_topk_blocked(
            out.cls_logits, out.reg, cfg, 128, 0.3, am)
        return list(batched_nms(boxes, scores, valid, 0.1))

    def timed(fn, label):
        @jax.jit
        def step(carry):
            outs = fn(batch["points"] + 1e-12 * carry)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        carry = step(jnp.float32(0.0))
        _ = float(carry)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            carry = step(carry * 1e-30)
        _ = float(carry)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{label:10s} {ms:8.2f} ms/batch"
              f"  ({args.batch / ms * 1e3:7.1f} scenes/s)")
        return ms

    print(f"mode={args.mode} B={args.batch} cumulative stage budget:")
    stages = [(s_vox, "vox"), (s_enc, "+enc")]
    if collab:
        stages.append((s_fuse, "+fuse"))
    stages += [(s_dec, "+dec"), (s_heads, "+heads"),
               (s_decode, "+decode"), (s_nms, "+nms")]
    prev = 0.0
    for fn, label in stages:
        ms = timed(fn, label)
        if prev:
            print(f"{'':10s} {'':8s}    delta {ms - prev:+7.2f} ms")
        prev = ms

    if args.train:
        tb = dict(batch)

        @jax.jit
        def prep(carry):
            b2 = dict(tb)
            b2["points"] = tb["points"] + 1e-12 * carry
            out = module.prepare_batch(b2)
            return sum(
                v.astype(jnp.float32).sum()
                for v in jax.tree.leaves(out)
            )

        carry = prep(jnp.float32(0.0))
        _ = float(carry)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            carry = prep(carry * 1e-30)
        _ = float(carry)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{'prepare':10s} {ms:8.2f} ms/batch")

        prepared = module.prepare_batch(batch)
        st = state
        t0 = None
        for i in range(args.steps + 1):
            st, metrics = module.train_step(st, prepared)
            if i == 0:
                _ = float(metrics["loss"])
                t0 = time.perf_counter()
        _ = float(metrics["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{'train':10s} {ms:8.2f} ms/batch"
              f"  ({args.batch / ms * 1e3:7.1f} scenes/s)")


if __name__ == "__main__":
    main()
