"""Headline benchmark: collaborative BEV detection throughput on one chip.

Measures the full flagship inference pipeline — padded LiDAR points ->
on-device voxelization -> STPN backbone -> DiscoNet 6-agent fusion ->
heads -> box decode -> rotated NMS — at the production geometry
(256 x 256 x 13 BEV, 6 agents), end to end under one jit, on the real
TPU chip the driver provides. Also measures the training step (fwd +
bwd + adam at the same geometry) and reports achieved TFLOP/s + MFU
from the compiled executables' own FLOP counts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra keys: train_scenes_per_sec (step-only — the reference bakes
anchor targets offline in create_data, so per-step assignment is not
part of its training loop either), train_e2e_scenes_per_sec (streaming
prepare+step), tflops / mfu_pct (inference), train_tflops /
train_mfu_pct.

Resilience (round-2 lesson: BENCH_r02 died with a bare traceback when
the TPU tunnel's libtpu mismatched the persisted AOT cache): the
default entry point is an ORCHESTRATOR that runs the measurement in a
bounded subprocess; on failure/timeout it wipes the persistent compile
cache and retries once; it ALWAYS prints a JSON line — a diagnostic
{"error": ...} one if both attempts fail.

vs_baseline: the reference never published throughput (BASELINE.md);
the driver's north star is >=5x a PyTorch-GPU baseline. We normalize
against REFERENCE_GPU_SCENES_PER_SEC, derived from a LOCAL MEASUREMENT
of the reconstructed reference graph (v2x_sim_tpu/baselines/torch_ref.py
— STPN backbone + heads + DiscoNet fusion, production 256x256x13 /
6-agent geometry) on torch-cpu, scaled by a documented CPU-core->GPU
factor (bracket 50-150x, point estimate 100x — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
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

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip (public spec).
V5E_BF16_PEAK_FLOPS = 197e12

BATCH = int(os.environ.get("V2X_BENCH_BATCH", "16"))  # sweet spot; PERF.md
STEPS = 20
TRAIN_STEPS = 10
METRIC_NAME = "6-agent BEV det scenes/sec/chip (disco, e2e infer)"
ATTEMPT_TIMEOUT_S = int(os.environ.get("V2X_BENCH_TIMEOUT", "1500"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _compiled_flops(lowered_compiled) -> float:
    """Per-execution FLOP count from the compiled executable's own cost
    analysis (authoritative for MFU: counts what XLA actually emitted,
    including the s2d stages' deliberate 4x FLOP overhead). Returns 0.0
    if the backend doesn't expose it."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def run() -> None:
    """The actual measurement (runs inside the bounded subprocess)."""
    import jax
    import jax.numpy as jnp

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

    infer_flops = _compiled_flops(step.lower(batch, jnp.float32(0.0)).compile())

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
    infer_tflops = infer_flops * STEPS / dt / 1e12

    # ---------------------------------------------------------------- #
    # Training throughput (flagship mode, same geometry).
    #
    # train_scenes_per_sec: step-only — parity with the reference's
    # training loop, whose DataLoader reads anchor targets PREBAKED by
    # create_data (SURVEY.md §3.1); our prepare_batch is that offline
    # stage, run on-device and cacheable per epoch.
    # train_e2e_scenes_per_sec: streaming prepare+step, fresh targets
    # every step (what a no-cache pipeline would sustain). Both prepare
    # and step run on the one TensorCore, so they serialize in device
    # time; interleaved dispatch below hides only host time.
    # ---------------------------------------------------------------- #
    tstate = module.init(jax.random.PRNGKey(1), batch)

    prepared = module.prepare_batch(batch)
    jax.block_until_ready(prepared)

    # Honesty chain for training comes free: step k+1's input state is
    # step k's output (donated), so the final loss fetch forces the whole
    # sequence. (Do NOT rebuild the batch eagerly per step — an eager op
    # on the prepared occupancy changes its layout and forces a
    # recompile inside the timed loop.)
    tstate, metrics = module.train_step(tstate, prepared)  # compile
    train_flops = _compiled_flops(
        module.train_step.lower(tstate, prepared).compile()
    )
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        tstate, metrics = module.train_step(tstate, prepared)
    _ = float(metrics["loss"])
    dt_step = time.perf_counter() - t0
    train_sps = BATCH * TRAIN_STEPS / dt_step
    train_tflops = train_flops * TRAIN_STEPS / dt_step / 1e12

    # Streaming: interleave prepare (next batch) with step dispatch.
    # Both run on the one TensorCore, so device times add; the overlap
    # hides host/dispatch time only.
    t0 = time.perf_counter()
    nxt = prepared
    for _ in range(TRAIN_STEPS):
        cur = nxt
        nxt = module.prepare_batch(batch)
        tstate, metrics = module.train_step(tstate, cur)
    _ = float(metrics["loss"])
    dt_e2e = time.perf_counter() - t0
    train_e2e_sps = BATCH * TRAIN_STEPS / dt_e2e

    # Guarded: the cached-pipeline stage touches disk + threads and is the
    # only part of this file that has never run on the round-end TPU; a
    # failure there must not cost the whole headline JSON.
    try:
        train_cached_sps = _cached_pipeline_sps(module, cfg, spec, tstate)
    except Exception as e:  # noqa: BLE001 — headline must still print
        print(f"cached-pipeline stage failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        # None (JSON null), not NaN: json.dumps emits the bare token
        # `NaN`, which strict JSON parsers reject — failing the whole
        # headline line this guard exists to protect (r4 advisor).
        train_cached_sps = None

    print(
        json.dumps(
            {
                "metric": METRIC_NAME,
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(
                    scenes_per_sec / REFERENCE_GPU_SCENES_PER_SEC, 3
                ),
                "tflops": round(infer_tflops, 1),
                "mfu_pct": round(100 * infer_tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 1),
                "train_scenes_per_sec": round(train_sps, 2),
                "train_tflops": round(train_tflops, 1),
                "train_mfu_pct": round(
                    100 * train_tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 1
                ),
                "train_e2e_scenes_per_sec": round(train_e2e_sps, 2),
                "train_cached_scenes_per_sec": (
                    None if train_cached_sps is None
                    else round(train_cached_sps, 2)
                ),
            }
        )
    )


def _cached_pipeline_sps(module, cfg, spec, tstate) -> float:
    """THE ACTUAL TRAINING PATH, measured end to end: .npz frame cache on
    disk (baked targets, create_data_det --targets regime) -> background-
    thread prefetch (datasets.loader) -> host->device transfer ->
    prepare_batch (fast path) -> train_step. Every on-chip number above
    reuses one in-memory batch; this one answers whether the disk
    pipeline sustains the step rate (VERDICT r3 missing #4).

    Reuses the caller's trained state/step (already compiled); returns
    scenes/sec over 2 shuffled epochs of a 2*BATCH-frame cache.
    """
    import shutil as _shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.datasets.cache import NpzCacheDataset, save_frame
    from v2x_sim_tpu.datasets.loader import device_prefetch
    from v2x_sim_tpu.datasets.synthetic import generate_scene
    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.tools.common import strip_stale_targets
    from v2x_sim_tpu.tools.create_data_det import _add_targets

    tmpdir = tempfile.mkdtemp(prefix="v2x_bench_cache_")
    try:
        anchors = jnp.asarray(anchor_grid(cfg))
        caps = {}  # shared across frames: uniform index caps -> stackable
        for i in range(2 * BATCH):
            frame = generate_scene(cfg, spec, seed=50_000 + i)
            for k in ("visible", "gt_vehicle", "seg_labels"):
                frame.pop(k, None)
            save_frame(
                tmpdir, f"f{i:05d}", _add_targets(frame, cfg, anchors, caps)
            )
        ds = NpzCacheDataset(tmpdir)

        def epochs(n):
            for e in range(n):
                yield from ds.batches(BATCH, shuffle=True, seed=e)

        def dev_stage(raw):
            """Read->stacked host batch -> device-prepared batch. Runs in
            the prefetch thread (datasets.loader.device_prefetch): the
            host->device transfer for batch N+1 overlaps batch N's step —
            the r4 pipeline serialized transfer behind the step and lost
            40% of the on-chip rate to it (VERDICT r4 missing #5)."""
            raw = strip_stale_targets(raw, cfg)
            b = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
            return module.prepare_batch(b)

        def consume(n, state):
            steps = 0
            for batch in device_prefetch(epochs(n), dev_stage, depth=2):
                state, metrics = module.train_step(state, batch)
                steps += 1
            _ = float(metrics["loss"])  # force the whole chain
            return steps, state

        _, tstate = consume(1, tstate)  # warm: fast-path prepare compile
        t0 = time.perf_counter()
        steps, tstate = consume(2, tstate)
        dt = time.perf_counter() - t0
        sps = BATCH * steps / dt

        # Stage decomposition (stderr; the stdout contract stays one JSON
        # line): serial per-stage timings over one epoch, so the headline
        # overlap number above can be attributed (VERDICT r4 task 7).
        t_read = time.perf_counter()
        raws = [strip_stale_targets(r, cfg) for r in epochs(1)]
        t_read = time.perf_counter() - t_read
        t_xfer = time.perf_counter()
        devs = [
            {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
            for raw in raws
        ]
        jax.block_until_ready(devs)
        t_xfer = time.perf_counter() - t_xfer
        t_prep = time.perf_counter()
        preps = [module.prepare_batch(b) for b in devs]
        jax.block_until_ready(preps)
        t_prep = time.perf_counter() - t_prep
        t_step = time.perf_counter()
        for b in preps:
            tstate, metrics = module.train_step(tstate, b)
        _ = float(metrics["loss"])
        t_step = time.perf_counter() - t_step
        n_sc = BATCH * len(raws)
        print(
            "cached-pipeline decomposition (serial, scenes/sec): "
            f"read+decompress {n_sc / t_read:.1f}, "
            f"host->device {n_sc / t_xfer:.1f}, "
            f"prepare {n_sc / t_prep:.1f}, "
            f"train_step {n_sc / t_step:.1f}; overlapped e2e {sps:.1f}",
            file=sys.stderr,
        )
        return sps
    finally:
        _shutil.rmtree(tmpdir, ignore_errors=True)


def _attempt() -> tuple:
    """One bounded subprocess attempt. Returns (json_line | None, tail)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run"],
            capture_output=True,
            text=True,
            timeout=ATTEMPT_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired as e:
        tail = ((e.stderr or "") + (e.stdout or ""))[-800:]
        return None, f"timeout after {ATTEMPT_TIMEOUT_S}s; tail: {tail}"
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in obj and proc.returncode == 0:
                return line, ""
    return None, f"rc={proc.returncode}; stderr tail: {proc.stderr[-800:]}"


def _preflight() -> str:
    """30 s device round-trip probe (compile + execute + PULL). The
    round-4→5 outage mode was a terminal whose execute path worked but
    whose device->host transfer path hung forever — a probe that only
    block_until_ready()s looks healthy while every result pull stalls.
    Returns '' when healthy, else a one-line diagnosis for the JSON."""
    code = (
        "import numpy as np, jax.numpy as jnp;"
        "y = jnp.ones((128,128)) @ jnp.ones((128,128));"
        "print('OK', float(np.asarray(y)[0,0]))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=90,
        )
    except subprocess.TimeoutExpired:
        return (
            "preflight: device->host pull did not complete in 90s — "
            "TPU tunnel transfer path is wedged (execute/compile may "
            "still respond); bench skipped to fail fast"
        )
    if proc.returncode != 0 or "OK" not in proc.stdout:
        return f"preflight failed rc={proc.returncode}: {proc.stderr[-300:]}"
    return ""


def main() -> None:
    """Orchestrator: preflight -> bounded attempt -> cache wipe -> one
    retry -> guaranteed JSON output either way."""
    err = _preflight()
    if err:
        print(
            json.dumps(
                {
                    "metric": METRIC_NAME,
                    "value": 0.0,
                    "unit": "scenes/sec",
                    "vs_baseline": 0.0,
                    "error": err,
                }
            )
        )
        sys.exit(1)
    line, err = _attempt()
    if line is None:
        # Round-2 failure mode: persisted AOT executables built by a
        # different libtpu than the tunnel's current one fail at load.
        # A stale-cache failure is indistinguishable from a tunnel-down
        # failure from out here, so wipe and retry covers both cheaply.
        shutil.rmtree(CACHE_DIR, ignore_errors=True)
        line, err2 = _attempt()
        err = f"attempt1: {err} || attempt2 (cache wiped): {err2}"
    if line is not None:
        print(line)
        return
    print(
        json.dumps(
            {
                "metric": METRIC_NAME,
                "value": 0.0,
                "unit": "scenes/sec",
                "vs_baseline": 0.0,
                "error": err,
            }
        )
    )
    sys.exit(1)


if __name__ == "__main__":
    if "--run" in sys.argv:
        run()
    else:
        main()
