"""S-H clipping IoU must match both the hull-based jax IoU and the numpy
Sutherland–Hodgman oracle."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.ops import iou as iou_hull
from v2x_sim_tpu.ops import iou_sh
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


def test_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    a = _random_boxes(rng, 300)
    b = _random_boxes(rng, 300)
    got = np.asarray(iou_sh.rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([np_rotated_iou(a[i], b[i]) for i in range(300)])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_matches_hull_matrix():
    rng = np.random.default_rng(8)
    a = _random_boxes(rng, 24)
    b = _random_boxes(rng, 16)
    m_sh = np.asarray(iou_sh.rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    m_hull = np.asarray(iou_hull.rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(m_sh, m_hull, atol=2e-3)


def test_special_cases():
    same = jnp.asarray([[1.0, 2.0, 4.0, 2.0, 0.7]])
    np.testing.assert_allclose(
        np.asarray(iou_sh.rotated_iou(same, same)), [1.0], atol=1e-4
    )
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0, 2.0, 2.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(iou_sh.rotated_iou(a, b)), [1 / 3], atol=1e-4
    )
    far = jnp.asarray([[50.0, 50.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(iou_sh.rotated_iou(a, far)), [0.0], atol=1e-6
    )
    contained = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 0.2]])
    small = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(iou_sh.rotated_iou(contained, small)), [0.04], atol=1e-4
    )
