"""Point cloud -> dense BEV occupancy voxelization.

Analog of the reference's `voxelize_occupy` († coperception/utils/data_util.py,
SURVEY.md §2.1), which is a numpy scatter loop on host. Here it is an XLA
scatter over *padded* fixed-size point arrays so it jits, vmaps over the
(B, A) axes, and runs on-device as part of the streaming input pipeline
(BASELINE.json north_star: voxelization becomes an on-device stage).

Out-of-extent and padded points are dropped via `mode="drop"` scatter
semantics — no host-side filtering, no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig


def voxel_indices(points: jnp.ndarray, grid: GridConfig):
    """Quantize metric points into voxel indices.

    Args:
      points: (..., P, 3+) xyz (extra columns like intensity ignored).
      grid: grid geometry.

    Returns:
      idx: (..., P, 3) int32 voxel indices (may be out of range).
      valid: (..., P) bool, True where the point falls inside the extents.
    """
    lower = jnp.asarray(grid.lower, dtype=points.dtype)
    vs = jnp.asarray(grid.voxel_size, dtype=points.dtype)
    dims = jnp.asarray(grid.grid_shape, dtype=jnp.int32)
    rel = (points[..., :3] - lower) / vs
    idx = jnp.floor(rel).astype(jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    return idx, valid


def voxelize(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridConfig,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Scatter padded points into a dense binary occupancy grid.

    Args:
      points: (P, 3+) padded point array.
      mask: (P,) bool validity of each point (padding = False).
      grid: grid geometry.
      dtype: occupancy dtype. Pass the model's compute dtype (bfloat16)
        to halve the scatter's HBM traffic — the op is bandwidth-bound
        (measured 49 GiB/s effective on v5e; docs/PERF.md).

    Returns:
      (H, W, D) occupancy in {0, 1}. D is the z-axis, used as the
      input-channel dimension by the 2D backbone (reference treats the 13
      z-slices as conv input channels).
    """
    h, w, d = grid.grid_shape
    idx, valid = voxel_indices(points, grid)
    valid = valid & mask
    # Invalid points get an out-of-bounds index and are dropped by scatter.
    idx = jnp.where(valid[..., None], idx, jnp.array([h, w, d], jnp.int32))
    occ = jnp.zeros((h, w, d), dtype=dtype)
    return occ.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(
        jnp.ones((), dtype), mode="drop"
    )


def voxelize_blocked(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridConfig,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Voxelize straight into space-to-depth blocked layout.

    Returns (H/2, W/2, 4D) with channel (2*(x%2) + y%2)*D + z — exactly
    `models.s2d.space_to_depth(voxelize(...))`, without materializing the
    plain layout: the s2d relayout of the full-res occupancy cost ~1.8 ms
    of pure copies per production batch (docs/PERF.md), and the blocked
    map is what the s2d encoder consumes.
    """
    h, w, d = grid.grid_shape
    idx, valid = voxel_indices(points, grid)
    valid = valid & mask
    xb, xp = idx[:, 0] // 2, idx[:, 0] % 2
    yb, yp = idx[:, 1] // 2, idx[:, 1] % 2
    ch = (2 * xp + yp) * d + idx[:, 2]
    xb = jnp.where(valid, xb, h // 2)
    occ = jnp.zeros((h // 2, w // 2, 4 * d), dtype=dtype)
    return occ.at[xb, yb, ch].max(jnp.ones((), dtype), mode="drop")


def voxelize_batch(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridConfig,
    dtype: jnp.dtype = jnp.float32,
    blocked: bool = False,
) -> jnp.ndarray:
    """Voxelize a (..., P, 3+) batch of padded point clouds.

    Returns (..., H, W, D), or (..., H/2, W/2, 4D) with `blocked=True`
    (see voxelize_blocked)."""
    batch_shape = points.shape[:-2]
    flat_pts = points.reshape((-1,) + points.shape[-2:])
    flat_mask = mask.reshape((-1,) + mask.shape[-1:])
    import jax

    fn = voxelize_blocked if blocked else voxelize
    out = jax.vmap(lambda p, m: fn(p, m, grid, dtype))(flat_pts, flat_mask)
    return out.reshape(batch_shape + out.shape[-3:])


def merged_occupancy(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    trans: jnp.ndarray,
    agent_mask: jnp.ndarray,
    grid: GridConfig,
    dtype: jnp.dtype = jnp.float32,
    blocked: bool = False,
) -> jnp.ndarray:
    """Early-fusion occupancy: all agents' clouds merged into each agent's
    frame (upperbound input / DiscoNet teacher input — SURVEY.md §2.1).

    Args:
      points: (B, A, P, 3) padded per-agent points (own frames).
      point_mask: (B, A, P).
      trans: (B, A, A, 4, 4), trans[b, i, j] = T_{i<-j}.
      agent_mask: (B, A).

    Returns:
      (B, A, H, W, D) where slice [b, i] voxelizes the union of every
      real agent j's points transformed into agent i's frame.
    """
    b, a, p, _ = points.shape
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], -1)
    merged = jnp.einsum("bijxy,bjpy->bijpx", trans, hom)[..., :3]
    mmask = jnp.broadcast_to(
        point_mask[:, None, :, :] & agent_mask[:, None, :, None],
        (b, a, a, p),
    ).reshape(b, a, a * p)
    return voxelize_batch(
        merged.reshape(b, a, a * p, 3), mmask, grid,
        dtype=dtype, blocked=blocked,
    )
