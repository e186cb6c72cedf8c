"""bench_table internals: device pool target baking parity.

The sweep's per-step fast path reconstructs dense cls labels from the
pool's sparse pos/ignore indices (ops.assign.labels_from_sparse_idx —
the same wire format create_data_det --targets writes);
a mismatch vs the live assignment would silently train every table row
on wrong labels. _bake_pool_targets parity-checks batch 0 internally;
this test covers later batches and the end-to-end fetch closure.
"""

import numpy as np

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch

CFG = Config(
    grid=GridConfig(
        voxel_size=(2.0, 2.0, 1.25),
        area_extents=((-32, 32), (-32, 32), (-3, 2)),
    ),
    num_agents=2,
    fusion_layer=1,
)
SPEC = SyntheticSpec(
    num_vehicles=6, points_per_agent=256, max_gt=8, occlusion_prob=0.3
)


def test_pool_bake_reconstruction_matches_assignment():
    import jax.numpy as jnp

    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.ops.assign import assign_targets_batched
    from v2x_sim_tpu.ops.assign import labels_from_sparse_idx
    from v2x_sim_tpu.tools.bench_table import _bake_pool_targets

    pool = [
        generate_batch(CFG, SPEC, batch_size=2, seed=100 + i)
        for i in range(3)
    ]
    n = _bake_pool_targets(pool, CFG)

    anchors = jnp.asarray(anchor_grid(CFG))
    for raw in pool:  # every batch, not just the parity-checked first
        b, a, m, _ = raw["gt_boxes"].shape
        sp = assign_targets_batched(
            jnp.asarray(np.asarray(raw["gt_boxes"]).reshape(b * a, m, 5)),
            jnp.asarray(np.asarray(raw["gt_mask"]).reshape(b * a, m)),
            anchors,
            CFG,
            flat="sparse",
        )
        got = np.asarray(
            labels_from_sparse_idx(raw["pos_idx"], raw["ign_idx"], n)
        )
        assert np.array_equal(got.reshape(b * a, n), np.asarray(sp.labels))
        # sparse localization targets rode along unchanged
        assert np.array_equal(
            np.asarray(raw["tgt_reg"]).reshape(b * a, *sp.reg.shape[1:]),
            np.asarray(sp.reg),
        )
