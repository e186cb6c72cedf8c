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
    points: jnp.ndarray, mask: jnp.ndarray, grid: GridConfig
) -> jnp.ndarray:
    """Scatter padded points into a dense binary occupancy grid.

    Args:
      points: (P, 3+) padded point array.
      mask: (P,) bool validity of each point (padding = False).
      grid: grid geometry.

    Returns:
      (H, W, D) float32 occupancy in {0, 1}. D is the z-axis, used as the
      input-channel dimension by the 2D backbone (reference treats the 13
      z-slices as conv input channels).
    """
    h, w, d = grid.grid_shape
    idx, valid = voxel_indices(points, grid)
    valid = valid & mask
    # Invalid points get an out-of-bounds index and are dropped by scatter.
    idx = jnp.where(valid[..., None], idx, jnp.array([h, w, d], jnp.int32))
    occ = jnp.zeros((h, w, d), dtype=jnp.float32)
    return occ.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(1.0, mode="drop")


def voxelize_batch(
    points: jnp.ndarray, mask: jnp.ndarray, grid: GridConfig
) -> jnp.ndarray:
    """Voxelize a (..., P, 3+) batch of padded point clouds -> (..., H, W, D)."""
    batch_shape = points.shape[:-2]
    flat_pts = points.reshape((-1,) + points.shape[-2:])
    flat_mask = mask.reshape((-1,) + mask.shape[-1:])
    import jax

    out = jax.vmap(lambda p, m: voxelize(p, m, grid))(flat_pts, flat_mask)
    return out.reshape(batch_shape + out.shape[-3:])


def merged_occupancy(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    trans: jnp.ndarray,
    agent_mask: jnp.ndarray,
    grid: GridConfig,
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
    return voxelize_batch(merged.reshape(b, a, a * p, 3), mmask, grid)
