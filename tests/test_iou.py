"""Rotated IoU vs an independent Sutherland–Hodgman numpy oracle."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.ops.iou import rotated_iou, rotated_iou_matrix
from tests.oracles import np_rotated_iou


def _random_boxes(rng, n, spread=6.0):
    return np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(1.0, 5.0, n),
            rng.uniform(0.8, 3.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)


def test_identical_boxes():
    b = jnp.array([[1.0, 2.0, 4.0, 2.0, 0.7]])
    np.testing.assert_allclose(np.asarray(rotated_iou(b, b)), [1.0], atol=1e-4)


def test_disjoint_boxes():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[100.0, 100.0, 2.0, 2.0, -0.3]])
    np.testing.assert_allclose(np.asarray(rotated_iou(a, b)), [0.0], atol=1e-6)


def test_axis_aligned_half_overlap():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    # inter = 2, union = 6
    np.testing.assert_allclose(np.asarray(rotated_iou(a, b)), [1 / 3], atol=1e-4)


def test_rotated_45_cross():
    # Unit square vs same square rotated 45deg: known IoU = 2(sqrt2 - 1)/2 /
    # union; inter = 2*(sqrt(2)-1)^2... easier to trust the oracle here.
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0], np.float32)
    b = np.array([0.0, 0.0, 2.0, 2.0, np.pi / 4], np.float32)
    got = float(rotated_iou(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    want = np_rotated_iou(a, b)
    assert abs(got - want) < 1e-4


def test_random_pairs_vs_oracle():
    rng = np.random.default_rng(42)
    a = _random_boxes(rng, 200)
    b = _random_boxes(rng, 200)
    got = np.asarray(rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([np_rotated_iou(a[i], b[i]) for i in range(200)])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_contained_box():
    a = np.array([0.0, 0.0, 10.0, 10.0, 0.2], np.float32)
    b = np.array([0.0, 0.0, 2.0, 2.0, 1.0], np.float32)
    got = float(rotated_iou(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    np.testing.assert_allclose(got, 4.0 / 100.0, atol=1e-4)


def test_matrix_shape_and_symmetry():
    rng = np.random.default_rng(3)
    a = _random_boxes(rng, 16)
    m = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert m.shape == (16, 16)
    np.testing.assert_allclose(m, m.T, atol=1e-4)
    np.testing.assert_allclose(np.diag(m), np.ones(16), atol=1e-3)
