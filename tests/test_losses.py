"""Loss function sanity checks."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.utils.losses import (
    kd_mse_loss,
    seg_cross_entropy,
    smooth_l1_loss,
    softmax_focal_loss,
)


def test_focal_confident_correct_is_small():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])[None]  # (1,2,2)
    labels = jnp.asarray([[0, 1]])
    good = float(softmax_focal_loss(logits, labels))
    bad = float(softmax_focal_loss(logits, jnp.asarray([[1, 0]])))
    assert good < 1e-4
    assert bad > 1.0


def test_focal_ignores_negative_labels():
    logits = jnp.zeros((1, 3, 2))
    labels = jnp.asarray([[-1, -1, -1]])
    assert float(softmax_focal_loss(logits, labels)) == 0.0


def test_smooth_l1_masking():
    pred = jnp.ones((4, 6))
    target = jnp.zeros((4, 6))
    mask_none = jnp.zeros(4)
    mask_one = jnp.asarray([1.0, 0, 0, 0])
    assert float(smooth_l1_loss(pred, target, mask_none)) == 0.0
    # |diff|=1 -> huber = 0.5 per dim, 6 dims, 1 positive -> 3.0
    np.testing.assert_allclose(float(smooth_l1_loss(pred, target, mask_one)), 3.0)


def test_seg_ce_perfect_prediction():
    logits = jnp.asarray([[[10.0, -10.0], [-10.0, 10.0]]])  # (1,2,2cls)
    labels = jnp.asarray([[0, 1]])
    assert float(seg_cross_entropy(logits, labels, 2)) < 1e-3


def test_kd_mse():
    a = jnp.ones((2, 3))
    assert float(kd_mse_loss(a, a)) == 0.0
    assert float(kd_mse_loss(a, a * 3)) == 4.0


def test_sparse_smooth_l1_matches_dense():
    """smooth_l1_loss_sparse_sum == smooth_l1_loss_sum on the same
    logical positives, in both plain and blocked index layouts."""
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.losses import (
        smooth_l1_loss_sparse_sum,
        smooth_l1_loss_sum,
    )

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8
    spec = SyntheticSpec(
        num_vehicles=5, points_per_agent=256, max_gt=8, points_per_vehicle=16
    )
    raw = generate_batch(cfg, spec, batch_size=2, seed=11)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
    b, a = batch["agent_mask"].shape

    for blocked in (False, True):
        mod = DetModule(cfg, mode="lowerbound")
        mod._blocked = blocked
        sp = mod.targets_from_gt(
            batch["gt_boxes"], batch["gt_mask"], flat="sparse"
        )
        cell, lane = mod._positive_indices(sp.cells, b, a)
        sp_t, sp_w = sp.reg, sp.wts
        assert float(sp_w.sum()) > 0  # synthetic scene has positives

        full = mod.targets_from_gt(batch["gt_boxes"], batch["gt_mask"])
        h, w, k = full.labels.shape[-3:]
        # Dense reference loss on a random prediction map.
        key = jax.random.PRNGKey(blocked)
        pred = jax.random.normal(key, (b, a, h, w, k, 6)) * 0.2
        dense_sum, dense_n = smooth_l1_loss_sum(
            pred, full.reg_targets, full.reg_mask
        )

        if blocked:
            from v2x_sim_tpu.models.s2d import space_to_depth

            pb = space_to_depth(
                pred.reshape(b * a, h, w, k * 6)
            ).reshape(b, a, (h // 2) * (w // 2), 4 * k * 6)
        else:
            pb = pred.reshape(b, a, h * w, k * 6)
        sp_sum, sp_n = smooth_l1_loss_sparse_sum(pb, cell, lane, sp_t, sp_w)
        np.testing.assert_allclose(float(sp_n), float(dense_n), err_msg=str(blocked))
        np.testing.assert_allclose(
            float(sp_sum), float(dense_sum), rtol=1e-5, err_msg=str(blocked)
        )
