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
        # sparse localization targets rode along, bf16-storage-rounded
        # (pool HBM budget — bench_table._bake_pool_targets dtypes)
        assert raw["tgt_reg"].dtype == jnp.bfloat16
        assert raw["tgt_wts"].dtype == jnp.int8
        np.testing.assert_allclose(
            np.asarray(raw["tgt_reg"], np.float32).reshape(
                b * a, *sp.reg.shape[1:]
            ),
            np.asarray(sp.reg),
            rtol=0.5 / 128,  # one bf16 ulp
            atol=1e-6,
        )


def test_seed_merge_folds_cross_run_curves(tmp_path):
    """bench_table_merge: two independent sweeps (one seed each) fold
    into per-mode mean±std over the FINAL milestone, keep per-seed
    columns, and render every milestone in the convergence section."""
    import json

    from v2x_sim_tpu.tools.bench_table_merge import load_records, render

    a = tmp_path / "s0_curves.jsonl"
    b = tmp_path / "s1_curves.jsonl"
    a.write_text(
        json.dumps({"mode": "disco", "seed": 0, "curve": [
            {"step": 100, "loss": 0.5, "mAP@0.5": 0.10, "mAP@0.7": 0.05},
            {"step": 200, "loss": 0.4, "mAP@0.5": 0.20, "mAP@0.7": 0.10},
        ]}) + "\n"
    )
    b.write_text(
        json.dumps({"mode": "disco", "seed": 1, "curve": [
            # deliberately out of order: merge must sort by step
            {"step": 200, "loss": 0.2, "mAP@0.5": 0.40, "mAP@0.7": 0.30},
            {"step": 100, "loss": 0.6, "mAP@0.5": 0.05, "mAP@0.7": 0.02},
        ]}) + "\n"
        + json.dumps({"mode": "lowerbound", "seed": 1, "curve": [
            {"step": 200, "loss": 0.7, "mAP@0.5": 0.08, "mAP@0.7": 0.03},
        ]}) + "\n"
    )

    by_mode = load_records([str(a), str(b)])
    assert set(by_mode) == {"disco", "lowerbound"}
    assert by_mode["disco"][1][-1]["step"] == 200  # sorted despite file order

    md = render(by_mode, [str(a), str(b)])
    # disco finals: 0.20 and 0.40 -> mean 0.3, population std 0.1
    assert "0.3±0.1" in md
    # single-seed mode renders without a ±, with a dash for the absent seed
    row = next(l for l in md.splitlines() if l.startswith("| lowerbound"))
    assert "—" in row and "±" not in row.split("|")[4]
    # convergence section carries every milestone
    assert "0.05@100 → 0.4@200" in md
