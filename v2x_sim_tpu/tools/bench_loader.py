"""Host-side reader throughput: native C++ loader vs numpy fallback.

The .pcd.bin reader (native/loader.cpp, ctypes-wrapped) is the raw-
dataset analog of the reference's DataLoader workers (SURVEY.md §3.2).
This microbench answers whether the host reader can feed the chip:
it writes a farm of synthetic sweeps, then times batched reads
(read + truncate/pad + optional 4x4 transform) through both paths.

  python -m v2x_sim_tpu.tools.bench_loader            # defaults
  python -m v2x_sim_tpu.tools.bench_loader --files 96 --points 30000
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--files", type=int, default=48,
                   help="sweeps per epoch (one per (scene, agent))")
    p.add_argument("--points", type=int, default=30_000,
                   help="points per sweep (V2X-Sim sweeps are ~20-35k)")
    p.add_argument("--max_points", type=int, default=8192)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument(
        "--cache", action="store_true",
        help="benchmark the .npz frame-cache read path instead "
        "(datasets.cache wire-format knobs: compressed vs uncompressed "
        "x serial vs threaded batch reads) on production-geometry "
        "frames with baked sparse targets",
    )
    args = p.parse_args()
    if args.cache:
        return bench_cache(args)

    from v2x_sim_tpu.native.loader import (
        _read_pcd_batch_numpy,
        native_available,
        read_pcd_batch,
    )

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="v2x_loader_bench_") as d:
        paths = []
        for i in range(args.files):
            rec = rng.standard_normal((args.points, 5)).astype(np.float32)
            path = f"{d}/sweep_{i:04d}.pcd.bin"
            rec.tofile(path)
            paths.append(path)
        transforms = np.tile(
            np.eye(4, dtype=np.float32), (args.files, 1, 1)
        )

        def timed(fn):
            fn()  # warm the page cache — steady-state epochs re-read it
            t0 = time.perf_counter()
            for _ in range(args.epochs):
                fn()
            dt = time.perf_counter() - t0
            return args.files * args.epochs / dt

        native_sps = (
            timed(lambda: read_pcd_batch(
                paths, args.max_points, transforms=transforms
            ))
            if native_available()
            else 0.0
        )
        numpy_sps = timed(lambda: _read_pcd_batch_numpy(
            paths, args.max_points, 5, transforms
        ))
        print(json.dumps({
            "files": args.files,
            "points_per_file": args.points,
            "max_points": args.max_points,
            "native_sweeps_per_sec": round(native_sps, 1),
            "numpy_sweeps_per_sec": round(numpy_sps, 1),
            "native_available": native_available(),
            "mb_per_sec_native": round(
                native_sps * args.points * 5 * 4 / 1e6, 1
            ),
        }))


def bench_cache(args):
    """Frame-cache read throughput across the wire-format knobs.

    Answers which term of the cached-pipeline read stage dominates
    (VERDICT r4 missing #5): zlib decompression (fixed by
    create_data --uncompressed) or single-threaded reads (fixed by
    iter_batches workers). Synthetic production-geometry det frames
    WITH baked sparse targets, matching what bench.py's cached stage
    streams.
    """
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile as _tf

    import jax.numpy as jnp

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.cache import NpzCacheDataset, save_frame
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_scene
    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.tools.create_data_det import _add_targets

    cfg = Config(grid=GridConfig())
    spec = SyntheticSpec()
    anchors = jnp.asarray(anchor_grid(cfg))
    out = {}
    with _tf.TemporaryDirectory(prefix="v2x_cache_bench_") as d:
        caps = {}
        frames = []
        for i in range(args.files):
            frame = generate_scene(cfg, spec, seed=60_000 + i)
            for k in ("visible", "gt_vehicle", "seg_labels"):
                frame.pop(k, None)
            frames.append(_add_targets(frame, cfg, anchors, caps))
        for comp, tag in ((True, "compressed"), (False, "uncompressed")):
            sub = os.path.join(d, tag)
            for i, f in enumerate(frames):
                save_frame(sub, f"f{i:05d}", f, compress=comp)
            ds = NpzCacheDataset(sub)
            size_mb = sum(
                os.path.getsize(p) for p in ds.files) / 1e6
            for workers in (0, 4):
                next(iter(ds.batches(8, workers=workers)))  # page-cache warm
                t0 = time.perf_counter()
                for _ in range(args.epochs):
                    for _b in ds.batches(8, workers=workers):
                        pass
                dt = time.perf_counter() - t0
                out[f"{tag}_w{workers}_frames_per_sec"] = round(
                    args.files * args.epochs / dt, 1
                )
            out[f"{tag}_mb"] = round(size_mb, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
