"""GT->anchor target assignment sanity (SURVEY.md §4 golden cases)."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.ops.anchors import anchor_grid
from v2x_sim_tpu.ops.assign import assign_targets
from v2x_sim_tpu.ops.boxes import decode_boxes

CFG = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))


def test_positive_near_gt_and_decode_roundtrip():
    anchors = jnp.asarray(anchor_grid(CFG))
    gt = jnp.asarray([[5.0, 3.0, 4.0, 2.0, 0.0]])
    tgt = assign_targets(gt, jnp.asarray([True]), anchors, CFG)
    labels = np.asarray(tgt.labels)
    pos = np.argwhere(labels == 1)
    assert len(pos) >= 1
    # All positives are near the GT center cell: (5,3) metric -> cell (37,35).
    assert np.all(np.abs(pos[:, 0] - 37) <= 4)
    assert np.all(np.abs(pos[:, 1] - 35) <= 4)
    # Decoding the stored regression target from its anchor recovers the GT.
    r, c, k = pos[0]
    dec = np.asarray(
        decode_boxes(tgt.reg_targets[r, c, k], anchors[r, c, k])
    )
    np.testing.assert_allclose(dec[:4], [5.0, 3.0, 4.0, 2.0], atol=1e-4)


def test_invalid_gt_produces_no_positives():
    anchors = jnp.asarray(anchor_grid(CFG))
    gt = jnp.asarray([[5.0, 3.0, 4.0, 2.0, 0.0]])
    tgt = assign_targets(gt, jnp.asarray([False]), anchors, CFG)
    assert int((np.asarray(tgt.labels) == 1).sum()) == 0
    assert np.asarray(tgt.reg_mask).sum() == 0


def test_every_valid_gt_gets_an_anchor():
    anchors = jnp.asarray(anchor_grid(CFG))
    rng = np.random.default_rng(0)
    m = 6
    gt = np.stack(
        [
            rng.uniform(-25, 25, m),
            rng.uniform(-25, 25, m),
            rng.uniform(3.5, 5, m),
            rng.uniform(1.5, 2.2, m),
            rng.uniform(-np.pi, np.pi, m),
        ],
        -1,
    ).astype(np.float32)
    tgt = assign_targets(
        jnp.asarray(gt), jnp.asarray(np.ones(m, bool)), anchors, CFG
    )
    # Forced-positive rule: at least one positive anchor per GT.
    assert int((np.asarray(tgt.labels) == 1).sum()) >= m
