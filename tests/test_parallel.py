"""Data-parallel shard_map training over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 8-way DP step vs single-device, exact

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    make_parallel_prepare,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from v2x_sim_tpu.train.det_module import DetModule

CFG = Config(
    grid=GridConfig(voxel_size=(2.0, 2.0, 1.25)),
    num_agents=2,
)
SPEC = SyntheticSpec(
    num_vehicles=3, points_per_agent=256, max_gt=4, points_per_vehicle=24
)


def test_dp_step_matches_single_device():
    n = 8
    assert jax.device_count() >= n, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(num_devices=n)

    raw = generate_batch(CFG, SPEC, batch_size=n, seed=3)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

    # Single-device run.
    mod1 = DetModule(CFG, mode="mean")
    state1 = mod1.init(jax.random.PRNGKey(0), batch)
    prep1 = mod1.prepare_batch(batch)
    state1b, m1 = mod1.train_step(state1, prep1)

    # DP run over the mesh.
    mod8 = DetModule(CFG, mode="mean", axis_name=DATA_AXIS)
    state8 = mod8.init(jax.random.PRNGKey(0), batch)
    state8 = replicate(state8, mesh)
    sharded = shard_batch(batch, mesh)
    prep = make_parallel_prepare(mod8, mesh)
    step = make_parallel_train_step(mod8, mesh)
    state8b, m8 = step(state8, prep(sharded))

    # pmean of per-shard grads == full-batch grads -> identical loss and
    # near-identical updated params.
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    p1 = jax.tree.leaves(state1b.params)[0]
    p8 = jax.tree.leaves(state8b.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
