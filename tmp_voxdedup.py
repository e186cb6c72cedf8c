"""A/B: scatter vs sort+dedup scatter for blocked voxelize at B=16."""
import time
import jax, jax.numpy as jnp
from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.ops.voxelize import voxel_indices

cfg = Config()
grid = cfg.grid
spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
raw = generate_batch(cfg, spec, batch_size=16, seed=0)
pts = jnp.asarray(raw["points"]).reshape(-1, 8192, 3)
pm = jnp.asarray(raw["point_mask"]).reshape(-1, 8192)
h, w, d = grid.grid_shape
nflat = (h // 2) * (w // 2) * 4 * d

def flat_ids(p, m):
    idx, valid = voxel_indices(p, grid)
    valid = valid & m
    xb, xp = idx[..., 0] // 2, idx[..., 0] % 2
    yb, yp = idx[..., 1] // 2, idx[..., 1] % 2
    ch = (2 * xp + yp) * d + idx[..., 2]
    fid = (xb * (w // 2) + yb) * (4 * d) + ch
    return jnp.where(valid, fid, nflat)  # nflat = drop slot

def vox_plain(p, m):
    fid = flat_ids(p, m)
    occ = jnp.zeros((p.shape[0], nflat), jnp.bfloat16)
    return occ.at[jnp.arange(p.shape[0])[:, None], fid].max(
        jnp.ones((), jnp.bfloat16), mode="drop")

def vox_dedup(p, m):
    fid = flat_ids(p, m)
    s = jax.lax.sort(fid, dimension=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    s = jnp.where(first, s, nflat)
    occ = jnp.zeros((p.shape[0], nflat), jnp.bfloat16)
    return occ.at[jnp.arange(p.shape[0])[:, None], s].max(
        jnp.ones((), jnp.bfloat16), mode="drop")

for name, fn in [("plain", vox_plain), ("dedup", vox_dedup)]:
    @jax.jit
    def step(carry, fn=fn):
        occ = fn(pts + 1e-12 * carry, pm)
        return occ.sum(axis=-1).astype(jnp.float32).sum()
    c = step(jnp.float32(0.0)); _ = float(c)
    t0 = time.perf_counter()
    for _ in range(10):
        c = step(c * 1e-30)
    _ = float(c)
    print(f"{name}: {(time.perf_counter()-t0)/10*1e3:7.2f} ms")

import numpy as np
a = np.asarray(vox_plain(pts, pm), np.float32)
b = np.asarray(vox_dedup(pts, pm), np.float32)
np.testing.assert_array_equal(a, b)
print("equal")
