"""LiDAR visibility (free-space) maps.

Analog of the reference dataset's `vis_maps` output
(† coperception/datasets/V2XSimDet.py returns per-agent visibility grids
computed at create_data time by host-side ray traversal — SURVEY.md §2.1).

TPU-native design: instead of a per-ray Bresenham walk (data-dependent
loop lengths, host-only), every LiDAR ray is sampled at a *static* number
of fractions of its length and the samples are scattered into the voxel
grid with the same padded-points scatter used by ops.voxelize. The whole
op jits and vmaps over (B, A); it is intended for the preprocessing /
create_data stage (the reference also computes vis_maps offline), not the
per-step hot path.

Encoding (trinary, MotionNet-style  # VERIFY vs reference):
  0 = unknown (never observed), 1 = free (a ray passed through),
  2 = occupied (a LiDAR return landed in the cell).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.ops.voxelize import voxel_indices, voxelize

FREE = 1.0
OCCUPIED = 2.0

#: Shared ray-sampling density: create_data --vis_samples and the
#: on-device fallback in train.det_module both default to this, so a
#: model trained on baked maps sees identical free-space carving when
#: evaluated through the fallback (round-1 advisor finding).
#: 384 samples over the grid-clipped segment keep the sample spacing
#: under the 0.25 m production voxel for any ray (the in-grid segment is
#: at most the ~91 m grid diagonal): gap-free carving like the
#: reference's Bresenham walk, with a static shape.
DEFAULT_NUM_SAMPLES = 384


def visibility_map(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridConfig,
    origin: Optional[jnp.ndarray] = None,
    num_samples: int = DEFAULT_NUM_SAMPLES,
) -> jnp.ndarray:
    """Trinary visibility grid from one padded point cloud.

    Args:
      points: (P, 3+) padded points in the agent frame.
      mask: (P,) point validity.
      grid: grid geometry.
      origin: (3,) sensor origin in the same frame (default zeros).
      num_samples: ray samples per point, spread over the ray's
        GRID-CLIPPED segment (slab test below), so the budget is never
        wasted outside the extents: spacing <= grid_diagonal/num_samples
        regardless of return range. Keep that under the voxel size for
        gap-free carving (the default covers the production grid).

    Returns:
      (H, W, D) float32 grid in {0, 1, 2} (unknown / free / occupied).
    """
    p = points[..., :3]
    if origin is None:
        origin = jnp.zeros((3,), p.dtype)
    origin = jnp.asarray(origin, p.dtype)

    # Clip each ray to the grid AABB (slab method) so all samples land
    # inside the extents: without this, a 90 m return sampled over its
    # full length leaves >0.25 m gaps between samples and the carving has
    # holes the reference's Bresenham walk doesn't.
    lo = jnp.asarray([e[0] for e in grid.area_extents], p.dtype)
    hi = jnp.asarray([e[1] for e in grid.area_extents], p.dtype)
    d = p - origin  # (P, 3)
    big = jnp.asarray(1e30, p.dtype)
    inv = jnp.where(jnp.abs(d) > 1e-9, 1.0 / jnp.where(d == 0, 1.0, d), big)
    ta = (lo - origin) * inv
    tb = (hi - origin) * inv
    tmin = jnp.clip(jnp.max(jnp.minimum(ta, tb), axis=-1), 0.0, 1.0)  # (P,)
    tmax = jnp.clip(jnp.min(jnp.maximum(ta, tb), axis=-1), 0.0, 1.0)
    seg_ok = tmax > tmin

    # Sample strictly-interior fractions of the clipped segment: the
    # endpoint voxel itself must stay "occupied", so samples that land in
    # it are masked out.
    frac = jnp.arange(num_samples, dtype=p.dtype) / num_samples  # (S,)
    t = tmin[None, :] + frac[:, None] * (tmax - tmin)[None]  # (S, P)
    samples = origin + t[..., None] * d[None]  # (S, P, 3)

    end_idx, _ = voxel_indices(p, grid)
    s_idx, s_valid = voxel_indices(samples, grid)
    in_end_cell = jnp.all(s_idx == end_idx[None], axis=-1)
    s_mask = s_valid & (mask & seg_ok)[None, :] & ~in_end_cell

    free = voxelize(samples.reshape(-1, 3), s_mask.reshape(-1), grid)
    occ = voxelize(p, mask, grid)
    return jnp.maximum(free * FREE, occ * OCCUPIED)


def visibility_batch(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridConfig,
    num_samples: int = DEFAULT_NUM_SAMPLES,
) -> jnp.ndarray:
    """(..., P, 3+) padded clouds -> (..., H, W, D) visibility grids."""
    batch_shape = points.shape[:-2]
    flat_pts = points.reshape((-1,) + points.shape[-2:])
    flat_mask = mask.reshape((-1,) + mask.shape[-1:])
    out = jax.vmap(
        lambda p, m: visibility_map(p, m, grid, num_samples=num_samples)
    )(flat_pts, flat_mask)
    return out.reshape(batch_shape + out.shape[-3:])
