"""Voxelizer vs a naive numpy scatter loop (SURVEY.md §4 unit tests)."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.ops.voxelize import voxelize, voxelize_batch

GRID = GridConfig(voxel_size=(1.0, 1.0, 0.625))  # 64x64x8


def naive_voxelize(points, mask, grid):
    h, w, d = grid.grid_shape
    occ = np.zeros((h, w, d), np.float32)
    lower = np.array(grid.lower)
    vs = np.array(grid.voxel_size)
    for p, m in zip(points, mask):
        if not m:
            continue
        idx = np.floor((p[:3] - lower) / vs).astype(int)
        if (idx >= 0).all() and (idx < [h, w, d]).all():
            occ[tuple(idx)] = 1.0
    return occ


def test_voxelize_matches_naive():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-40, 40, (500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 3, 500)
    mask = rng.uniform(size=500) > 0.1
    got = np.asarray(voxelize(jnp.asarray(pts), jnp.asarray(mask), GRID))
    want = naive_voxelize(pts, mask, GRID)
    np.testing.assert_array_equal(got, want)


def test_padding_dropped():
    pts = np.zeros((10, 3), np.float32)  # all at origin
    mask = np.zeros(10, bool)
    occ = np.asarray(voxelize(jnp.asarray(pts), jnp.asarray(mask), GRID))
    assert occ.sum() == 0


def test_boundary_points():
    # Points exactly on the lower edge are inside; upper edge outside.
    pts = np.array([[-32.0, -32.0, -3.0], [31.999, 31.999, 1.999]], np.float32)
    mask = np.ones(2, bool)
    occ = np.asarray(voxelize(jnp.asarray(pts), jnp.asarray(mask), GRID))
    assert occ[0, 0, 0] == 1.0 and occ[-1, -1, -1] == 1.0
    assert occ.sum() == 2


def test_batch_shape():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, (2, 3, 100, 3)).astype(np.float32)
    mask = np.ones((2, 3, 100), bool)
    occ = voxelize_batch(jnp.asarray(pts), jnp.asarray(mask), GRID)
    assert occ.shape == (2, 3) + GRID.grid_shape


def test_blocked_matches_space_to_depth():
    from v2x_sim_tpu.models.s2d import space_to_depth
    from v2x_sim_tpu.ops.voxelize import voxelize_blocked

    rng = np.random.default_rng(2)
    pts = rng.uniform(-33, 33, (500, 3)).astype(np.float32)
    mask = rng.random(500) < 0.9
    plain = voxelize(jnp.asarray(pts), jnp.asarray(mask), GRID)
    blocked = voxelize_blocked(jnp.asarray(pts), jnp.asarray(mask), GRID)
    np.testing.assert_array_equal(
        np.asarray(blocked), np.asarray(space_to_depth(plain))
    )


def test_blocked_dtype_batch():
    from v2x_sim_tpu.ops.voxelize import voxelize_batch

    rng = np.random.default_rng(3)
    pts = rng.uniform(-30, 30, (2, 3, 64, 3)).astype(np.float32)
    mask = np.ones((2, 3, 64), bool)
    occ = voxelize_batch(
        jnp.asarray(pts), jnp.asarray(mask), GRID,
        dtype=jnp.bfloat16, blocked=True,
    )
    h, w, d = GRID.grid_shape
    assert occ.shape == (2, 3, h // 2, w // 2, 4 * d)
    assert occ.dtype == jnp.bfloat16
