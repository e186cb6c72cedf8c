"""ctypes bindings for the native threaded .pcd.bin batch loader.

Builds `libv2xloader.so` on first use (g++ -O3, no external deps) and
exposes `read_pcd_batch`. Falls back to a numpy loop transparently when
a compiler is unavailable, so the framework never hard-requires the
native path — it's an IO accelerator (multi-core, GIL-free), not a
correctness dependency. Parity is tested in tests/test_native_loader.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libv2xloader.so")
_lib = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    # <= (not <): after a fresh checkout .so and .cpp share one mtime and
    # a stale (or foreign -march=native) binary would otherwise be loaded.
    if not os.path.exists(_SO) or os.path.getmtime(_SO) <= os.path.getmtime(_SRC):
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", "-pthread", _SRC, "-o", _SO,
                ],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # Corrupt / wrong-platform binary: honor the numpy-fallback
        # contract instead of raising at import-of-use time.
        _build_failed = True
        return None
    lib.v2x_read_pcd_batch.restype = ctypes.c_int64
    lib.v2x_read_pcd_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def read_pcd_batch(
    paths: List[str],
    max_points: int,
    stride_floats: int = 5,
    transforms: Optional[np.ndarray] = None,
    n_threads: int = 0,
):
    """Read a batch of .pcd.bin sweeps into padded buffers.

    Args:
      paths: list of file paths.
      max_points: pad/truncate point count per file.
      stride_floats: floats per record (nuScenes = 5: x,y,z,i,ring).
      transforms: optional (N, 4, 4) float32 rigid transforms applied to
        each file's points (e.g. sensor->ego frame).
      n_threads: worker threads (0 = one per CPU, capped at 16).

    Returns:
      points (N, max_points, 3) float32, mask (N, max_points) bool.
    """
    n = len(paths)
    points = np.zeros((n, max_points, 3), np.float32)
    mask = np.zeros((n, max_points), np.uint8)
    if n == 0:
        return points, mask.astype(bool)

    lib = _get_lib()
    if lib is None:
        return _read_pcd_batch_numpy(paths, max_points, stride_floats, transforms)

    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 4, 16)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    t_ptr = None
    if transforms is not None:
        transforms = np.ascontiguousarray(transforms, np.float32)
        assert transforms.shape == (n, 4, 4)
        t_ptr = transforms.ctypes.data_as(ctypes.c_void_p)
    err = lib.v2x_read_pcd_batch(
        c_paths,
        n,
        stride_floats,
        max_points,
        t_ptr,
        points.ctypes.data_as(ctypes.c_void_p),
        mask.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if err != 0:
        raise FileNotFoundError(f"native loader failed on {paths[err - 1]}")
    return points, mask.astype(bool)


def _read_pcd_batch_numpy(paths, max_points, stride_floats, transforms):
    """Reference fallback (and test oracle) for the native loader."""
    n = len(paths)
    points = np.zeros((n, max_points, 3), np.float32)
    mask = np.zeros((n, max_points), bool)
    for i, p in enumerate(paths):
        flat = np.fromfile(p, np.float32)
        # Drop a trailing partial record (truncated sweep) — the native
        # reader truncates the same way instead of erroring.
        usable = (flat.size // stride_floats) * stride_floats
        raw = flat[:usable].reshape(-1, stride_floats)[:max_points, :3]
        if transforms is not None:
            t = transforms[i]
            raw = raw @ t[:3, :3].T + t[:3, 3]
        points[i, : len(raw)] = raw
        mask[i, : len(raw)] = True
    return points, mask
