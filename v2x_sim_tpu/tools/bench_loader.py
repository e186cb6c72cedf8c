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
    args = p.parse_args()

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


if __name__ == "__main__":
    main()
