"""Baked anchor targets (create_data_det --targets 1) parity.

The reference bakes training targets offline in create_data
(SURVEY.md §3.1); our analog stores the layout-independent sparse
assignment in the .npz cache and DetModule.prepare_batch consumes it
verbatim when present. These tests pin the contract:

1. prepare_batch(baked batch) == prepare_batch(raw batch) exactly —
   same labels / positive indices / reg targets / weights.
2. strip_stale_targets drops tgt_* when the geometry fingerprint
   mismatches (and always removes tgt_meta).
3. The create_data_det CLI writes tgt_* keys that train one step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_scene
from v2x_sim_tpu.ops.anchors import anchor_grid
from v2x_sim_tpu.tools.common import strip_stale_targets
from v2x_sim_tpu.tools.create_data_det import _add_targets
from v2x_sim_tpu.train.det_module import DetModule

CFG = Config(
    grid=GridConfig(
        voxel_size=(2.0, 2.0, 1.25),
        area_extents=((-32, 32), (-32, 32), (-3, 2)),
    ),
    num_agents=2,
    fusion_layer=1,
)
SPEC = SyntheticSpec(
    num_vehicles=6, points_per_agent=512, max_gt=8, points_per_vehicle=48,
    lidar_range=40.0,
)
DROP = ("visible", "gt_vehicle")


def _frames(n):
    return [generate_scene(CFG, SPEC, seed=100 + i) for i in range(n)]


def _stack(frames):
    return {
        k: np.stack([f[k] for f in frames])
        for k in frames[0]
        if k not in DROP
    }


def test_prepare_batch_baked_equals_live():
    anchors = jnp.asarray(anchor_grid(CFG))
    frames = _frames(2)
    caps = {}  # shared across frames like the CLI does
    baked = [_add_targets(f, CFG, anchors, caps) for f in frames]

    raw_b = {k: jnp.asarray(v) for k, v in _stack(frames).items()}
    baked_b = strip_stale_targets(_stack(baked), CFG)
    baked_b = {k: jnp.asarray(v) for k, v in baked_b.items()}

    mod = DetModule(CFG, mode="disco", width_mult=0.25)
    live = mod.prepare_batch(raw_b)
    from_cache = mod.prepare_batch(baked_b)

    for key in ("labels", "reg_cell", "reg_lane", "reg_sp_t", "reg_sp_w"):
        np.testing.assert_array_equal(
            np.asarray(live[key]), np.asarray(from_cache[key]), err_msg=key
        )
    # The baked inputs themselves must not leak into the prepared batch.
    assert not any(k.startswith("tgt_") for k in from_cache)


def test_strip_stale_targets_fingerprint():
    anchors = jnp.asarray(anchor_grid(CFG))
    baked = _stack([_add_targets(f, CFG, anchors) for f in _frames(1)])

    ok = strip_stale_targets(baked, CFG)
    assert "tgt_pos_idx" in ok and "tgt_meta" not in ok

    other = Config(
        grid=GridConfig(
            voxel_size=(1.0, 1.0, 0.625),
            area_extents=((-32, 32), (-32, 32), (-3, 2)),
        ),
        num_agents=2,
        fusion_layer=1,
    )
    stale = strip_stale_targets(baked, other)
    assert not any(k.startswith("tgt_") for k in stale)
    # Raw batches pass through untouched.
    raw = _stack(_frames(1))
    assert strip_stale_targets(raw, CFG) is raw


@pytest.mark.slow
def test_create_data_cli_bakes_and_trains(tmp_path, monkeypatch):
    import sys

    from v2x_sim_tpu.datasets.cache import NpzCacheDataset
    from v2x_sim_tpu.tools import create_data_det

    monkeypatch.setattr(
        sys, "argv",
        [
            "create_data_det", "--root", "synthetic", "--savepath",
            str(tmp_path), "--scenes", "1", "--frames", "2", "--grid",
            "small", "--targets", "1",
        ],
    )
    create_data_det.main()

    ds = NpzCacheDataset(str(tmp_path / "train"))
    assert len(ds) == 2
    frame = ds[0]
    for key in ("tgt_pos_idx", "tgt_ign_idx", "tgt_cells", "tgt_reg",
                "tgt_wts", "tgt_meta"):
        assert key in frame, key

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))
    batch = strip_stale_targets(next(ds.batches(2)), cfg)
    batch = {
        k: jnp.asarray(v) for k, v in batch.items() if k not in DROP
    }
    mod = DetModule(cfg, mode="lowerbound", width_mult=0.25)
    state = mod.init(jax.random.PRNGKey(0), batch)
    state, metrics = mod.train_step(state, mod.prepare_batch(batch))
    assert np.isfinite(float(metrics["loss"]))
