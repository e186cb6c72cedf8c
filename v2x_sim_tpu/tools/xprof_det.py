"""Op-level XLA profile of the flagship inference step (xprof/xplane).

Captures a jax.profiler trace of the e2e predict step on the real chip
and prints per-HLO-op self times (category totals + top ops), using the
xprof converter bundled in this image. This is how the per-op numbers in
docs/PERF.md were measured — cumulative stage timing (tools/profile_det)
localizes a regression to a stage; this tool names the exact op.

Usage:
    python -m v2x_sim_tpu.tools.xprof_det [--batch 16] [--top 30]
        [--trace_dir /tmp/xtrace]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def capture(trace_dir: str, batch_size: int, what: str) -> None:
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    from v2x_sim_tpu.configs.config import Config
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.train.det_module import DetModule

    cfg = Config()
    spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
    raw = generate_batch(cfg, spec, batch_size=batch_size, seed=0)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
    module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
    state = module.init(jax.random.PRNGKey(0), batch)

    if what == "train":
        prepared = module.prepare_batch(batch)
        state, metrics = module.train_step(state, prepared)
        _ = float(metrics["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, metrics = module.train_step(state, prepared)
            _ = float(metrics["loss"])
        return
    if what == "prepare":
        @jax.jit
        def prep(carry):
            b2 = dict(batch)
            b2["points"] = batch["points"] + 1e-12 * carry
            out = module.prepare_batch(b2)
            return sum(
                v.astype(jnp.float32).sum() for v in jax.tree.leaves(out)
            )

        carry = prep(jnp.float32(0.0))
        _ = float(carry)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                carry = prep(carry * 1e-30)
            _ = float(carry)
        return

    @jax.jit
    def step(batch, carry):
        b2 = dict(batch)
        b2["points"] = batch["points"] + 1e-12 * carry
        res = module._predict_impl(state, b2, 128, 0.1, 0.3)
        return res, (
            res.boxes.astype(jnp.float32).sum()
            + res.scores.astype(jnp.float32).sum()
            + res.valid.astype(jnp.float32).sum()
        )

    out, carry = step(batch, jnp.float32(0.0))
    _ = float(carry)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out, carry = step(batch, carry * 1e-30)
        _ = float(carry)


def report(trace_dir: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    )
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    j = json.loads(data)
    rows = j["rows"]

    def v(r, i):
        return r["c"][i].get("v")

    steps = 3.0
    tot = sum(float(v(r, 9)) for r in rows)
    print(f"total device self time: {tot / steps / 1e3:.1f} ms/step")
    cats = {}
    for r in rows:
        cats[v(r, 2)] = cats.get(v(r, 2), 0.0) + float(v(r, 9)) / steps / 1e3
    for c, t in sorted(cats.items(), key=lambda x: -x[1]):
        if t >= 0.05:
            print(f"  {c:30s} {t:7.2f} ms")
    print("top ops (self time, per step):")
    for r in sorted(rows, key=lambda r: -float(v(r, 9)))[:top]:
        print(
            f"  {str(v(r, 2)):15.15s} {str(v(r, 3)):36.36s}"
            f" {float(v(r, 9)) / steps / 1e3:6.2f}ms"
            f" gflops/s={str(v(r, 14)):10.10s} bound={str(v(r, 21))}"
        )
        text = str(v(r, 4))
        print(f"      {text[:180]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace_dir", default="/tmp/xtrace")
    ap.add_argument("--what", default="predict",
                    choices=("predict", "train", "prepare"),
                    help="which jitted step to trace")
    ap.add_argument("--report_only", action="store_true",
                    help="parse an existing trace without capturing")
    args = ap.parse_args()
    if not args.report_only:
        import shutil

        shutil.rmtree(args.trace_dir, ignore_errors=True)
        capture(args.trace_dir, args.batch, args.what)
    report(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
