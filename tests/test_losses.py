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
