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


def test_sparse_positive_labels_always_supervised_fine_grid():
    """Round-5 invariant (docs/UPPERBOUND_DIAGNOSIS.md): in the sparse
    layout every label==1 anchor must carry a localization target; when
    positive cells exceed capacity the excess is demoted to ignore (-1),
    never left as an unsupervised positive. At 0.25 m voxels each GT has
    IoU>=0.4 anchors over ~100 cells, so a dense scene is exactly the
    regime that used to overflow the old 256-cell capacity."""
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.configs.config import Config
    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.ops.assign import (
        assign_targets_batched,
        sparse_cell_capacity,
    )

    cfg = Config()  # production grid: 256x256 at 0.25 m
    assert sparse_cell_capacity(cfg) >= 1024
    rng = np.random.default_rng(0)
    m = 12
    gt = np.stack(
        [
            rng.uniform(-28, 28, m),
            rng.uniform(-28, 28, m),
            rng.uniform(3.8, 5.0, m),
            rng.uniform(1.6, 2.1, m),
            rng.uniform(-np.pi, np.pi, m),
        ],
        -1,
    ).astype(np.float32)[None]
    anchors = jnp.asarray(anchor_grid(cfg))
    sp = assign_targets_batched(
        jnp.asarray(gt), jnp.ones((1, m), bool), anchors, cfg, flat="sparse"
    )
    lab = np.asarray(sp.labels)[0]
    wts = np.asarray(sp.wts)[0]
    cells = np.asarray(sp.cells)[0]
    k = cfg.anchors.num_anchors
    lanes = (cells[:, None] * k + np.arange(k)).reshape(-1)
    sup = np.zeros(lab.shape[0], bool)
    sup[lanes] = wts > 0
    assert (lab == 1).sum() > 100  # dense scene: plenty of positives
    assert ((lab == 1) <= sup).all()  # every positive is supervised
