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
