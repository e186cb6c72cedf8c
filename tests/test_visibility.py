"""ops.visibility: ray-sampled free-space carving vs hand-checked grids."""

import jax.numpy as jnp
import numpy as np

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.ops.visibility import FREE, OCCUPIED, visibility_batch, visibility_map

GRID = GridConfig(
    voxel_size=(1.0, 1.0, 1.0),
    area_extents=((0.0, 8.0), (0.0, 8.0), (0.0, 1.0)),
)


def test_single_ray_marks_free_then_occupied():
    # Sensor at (0.5, 0.5): ray along +x to a return at (6.5, 0.5).
    pts = jnp.array([[6.5, 0.5, 0.5]])
    mask = jnp.array([True])
    vis = np.asarray(
        visibility_map(pts, mask, GRID, origin=jnp.array([0.5, 0.5, 0.5]),
                       num_samples=64)
    )
    col = vis[:, 0, 0]
    assert col[6] == OCCUPIED
    np.testing.assert_array_equal(col[:6], FREE)
    assert col[7] == 0.0  # behind the return: unknown
    assert vis[:, 1:, :].max() == 0.0  # off-ray rows untouched


def test_padded_points_ignored():
    pts = jnp.array([[6.5, 0.5, 0.5], [3.5, 3.5, 0.5]])
    mask = jnp.array([False, False])
    vis = np.asarray(visibility_map(pts, mask, GRID))
    assert vis.max() == 0.0


def test_out_of_extent_return_still_carves_interior():
    # Return beyond the grid: endpoint dropped, traversed cells still free.
    pts = jnp.array([[20.5, 0.5, 0.5]])
    mask = jnp.array([True])
    vis = np.asarray(
        visibility_map(pts, mask, GRID, origin=jnp.array([0.5, 0.5, 0.5]),
                       num_samples=256)
    )
    col = vis[:, 0, 0]
    np.testing.assert_array_equal(col, np.full(8, FREE))


def test_batch_shape_and_equivalence():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.0, 8.0, size=(2, 3, 16, 3)).astype(np.float32)
    mask = rng.random((2, 3, 16)) < 0.8
    out = visibility_batch(jnp.asarray(pts), jnp.asarray(mask), GRID)
    assert out.shape == (2, 3, 8, 8, 1)
    one = visibility_map(jnp.asarray(pts[1, 2]), jnp.asarray(mask[1, 2]), GRID)
    np.testing.assert_array_equal(np.asarray(out[1, 2]), np.asarray(one))


def test_det_module_use_vis_end_to_end():
    """use_vis doubles the input channels and trains one step."""
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.configs.config import Config
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.train.det_module import DetModule

    cfg = Config(grid=GRID.__class__(voxel_size=(2.0, 2.0, 1.25)))
    spec = SyntheticSpec(num_vehicles=3, points_per_agent=256, max_gt=4,
                         points_per_vehicle=16)
    raw = generate_batch(cfg, spec, batch_size=1, seed=0)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
    module = DetModule(cfg, mode="mean", use_vis=True)
    state = module.init(jax.random.PRNGKey(0), batch)
    prepared = module.prepare_batch(batch)
    state, metrics = module.train_step(state, prepared)
    assert float(metrics["loss"]) > 0.0
    # vis channels double the backbone input depth
    d = cfg.grid.grid_shape[-1]
    vis = module._vis_input(batch)
    assert vis.shape[-1] == d and float(vis.max()) <= 1.0


def test_long_ray_carving_is_gap_free():
    """Grid-clipped sampling (review round-2): a return far beyond the
    extents must mark EVERY traversed in-grid cell free at the DEFAULT
    sample count — unclipped full-ray sampling left >50% gaps."""
    from v2x_sim_tpu.configs.config import GridConfig as GC

    grid = GC()  # production 256x256 @ 0.25 m
    pts = jnp.array([[90.0, 7.03, 0.5]])  # ~90 m, slightly off-axis
    mask = jnp.array([True])
    vis = np.asarray(
        visibility_map(pts, mask, grid, origin=jnp.array([0.0, 0.0, 0.5]))
    )
    h, w, d = vis.shape
    # Walk the ray analytically at fine resolution; collect in-grid cells.
    ts = np.linspace(0.0, 1.0, 4096)
    xs, ys = ts * 90.0, ts * 7.03
    (x0, x1), (y0, y1) = grid.area_extents[0], grid.area_extents[1]
    inside = (xs > x0) & (xs < x1) & (ys > y0) & (ys < y1)
    r = ((xs[inside] - x0) / grid.voxel_size[0]).astype(int).clip(0, h - 1)
    c = ((ys[inside] - y0) / grid.voxel_size[1]).astype(int).clip(0, w - 1)
    cells = set(zip(r.tolist(), c.tolist()))
    marked = sum(1 for (ri, ci) in cells if vis[ri, ci].max() > 0)
    # Corner-grazed cells the ray crosses for < one sample spacing may be
    # skipped; everything else must be carved (was ~36% unclipped).
    assert marked / len(cells) > 0.97, (marked, len(cells))
