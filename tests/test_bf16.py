"""bfloat16 activation path: finite, trains, and tracks the fp32 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model fp32 vs bf16 forward (two compiles)

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule

CFG = Config(grid=GridConfig(voxel_size=(2.0, 2.0, 1.25)), num_agents=2)
SPEC = SyntheticSpec(num_vehicles=4, points_per_agent=512, max_gt=8, points_per_vehicle=32)


def test_bf16_forward_close_to_fp32():
    raw = generate_batch(CFG, SPEC, batch_size=1, seed=11)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

    m32 = DetModule(CFG, mode="disco")
    m16 = DetModule(CFG, mode="disco", compute_dtype=jnp.bfloat16)
    state = m32.init(jax.random.PRNGKey(0), batch)
    # Same params work for both (params are always fp32).
    p = m32.prepare_batch(batch)
    _, metrics32 = m32.train_step(state, p)
    state16 = m16.init(jax.random.PRNGKey(0), batch)
    p16 = m16.prepare_batch(batch)
    state16, metrics16 = m16.train_step(state16, p16)
    assert np.isfinite(float(metrics16["loss"]))
    # bf16 losses live in the same ballpark as fp32 (same init seed).
    assert abs(float(metrics16["loss"]) - float(metrics32["loss"])) < 0.35 * (
        abs(float(metrics32["loss"])) + 1.0
    )
    res = m16.predict(state16, p16, 16, 0.1, 0.0)
    assert res.boxes.dtype == jnp.float32
    assert np.isfinite(np.asarray(res.boxes)).all()
