"""Headline benchmark: collaborative BEV detection throughput on one chip.

Measures the full flagship inference pipeline — padded LiDAR points ->
on-device voxelization -> STPN backbone -> DiscoNet 6-agent fusion ->
heads -> box decode -> rotated NMS — at the production geometry
(256 x 256 x 13 BEV, 6 agents), end to end under one jit, on the real
TPU chip the driver provides.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference never published throughput (BASELINE.md); the
driver's north star is >=5x a PyTorch-GPU baseline. We normalize against
REFERENCE_GPU_SCENES_PER_SEC, derived from a LOCAL MEASUREMENT of the
reconstructed reference graph (v2x_sim_tpu/baselines/torch_ref.py — STPN
backbone + heads + DiscoNet fusion, production 256x256x13 / 6-agent
geometry) on torch-cpu, scaled by a documented CPU-core->GPU factor.
"""

from __future__ import annotations

import json
import time

# Measured 2026-08-17 on this machine (1 x86 core, torch-cpu fp32):
#   python -m v2x_sim_tpu.baselines.torch_ref  ->  0.298 scenes/sec
# (forward only, eval mode — excludes the reference's host-side shapely
# postprocess, so the reference rate is OVERstated and our vs_baseline
# ratio is conservative).
REFERENCE_TORCH_CPU_SCENES_PER_SEC = 0.298
# Documented scaling assumption (BASELINE.md): a V100/3090-class GPU —
# the reference targets PyTorch 1.8 + CUDA 11.2 — delivers ~50-150x one
# x86 core on fp32 conv-bound CNNs; we take 100x as the point estimate.
CPU_CORE_TO_GPU_SCALE = 100.0
REFERENCE_GPU_SCENES_PER_SEC = (
    REFERENCE_TORCH_CPU_SCENES_PER_SEC * CPU_CORE_TO_GPU_SCALE
)  # = 29.8 scenes/sec — consistent with round 1's 30.0 estimate

import os as _os

BATCH = int(_os.environ.get("V2X_BENCH_BATCH", "16"))  # sweet spot; see docs/PERF.md
STEPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    from v2x_sim_tpu.configs.config import Config
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.train.det_module import DetModule

    cfg = Config()  # production geometry: 256x256x13, 6 agents
    spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
    raw = generate_batch(cfg, spec, batch_size=BATCH, seed=0)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

    # bfloat16 activations: MXU fast path; params stay float32.
    module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
    state = module.init(jax.random.PRNGKey(0), batch)

    # 128 NMS candidates per agent: plenty for <=32 GT/scene, and the
    # K x K suppression matrix stays in the fast einsum regime.
    #
    # Measurement honesty on the axon tunnel: block_until_ready can return
    # before remote execution completes, so each step's input depends on
    # the previous step's output (eps-perturbed points) and the clock only
    # stops on a host fetch of the final carry — the full chain of STEPS
    # executions must have run on device (docs/PERF.md methodology).
    # The carry must reduce over EVERY output: a single-element carry lets
    # XLA dead-code-eliminate whole output paths (e.g. the reg head + NMS
    # if only scores[0] is consumed).
    @jax.jit
    def step(batch, carry):
        b2 = dict(batch)
        b2["points"] = batch["points"] + 1e-12 * carry
        res = module._predict_impl(state, b2, 128, 0.1, 0.3)
        full = (
            res.boxes.astype(jnp.float32).sum()
            + res.scores.astype(jnp.float32).sum()
            + res.valid.astype(jnp.float32).sum()
        )
        return res, full

    # Warmup / compile.
    out, carry = step(batch, jnp.float32(0.0))
    _ = float(carry)

    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(STEPS):
        out, carry = step(batch, carry)
    _ = float(carry)
    dt = time.perf_counter() - t0

    scenes_per_sec = BATCH * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "6-agent BEV det scenes/sec/chip (disco, e2e infer)",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(
                    scenes_per_sec / REFERENCE_GPU_SCENES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
