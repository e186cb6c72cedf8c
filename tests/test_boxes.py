"""Unit tests for box corners and the anchor codec."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.ops.boxes import box_area, box_corners, decode_boxes, encode_boxes


def test_corners_axis_aligned():
    box = jnp.array([1.0, 2.0, 4.0, 2.0, 0.0])
    c = np.asarray(box_corners(box))
    expected = np.array([[3.0, 3.0], [-1.0, 3.0], [-1.0, 1.0], [3.0, 1.0]])
    np.testing.assert_allclose(c, expected, atol=1e-6)


def test_corners_rotated_90():
    box = jnp.array([0.0, 0.0, 4.0, 2.0, np.pi / 2])
    c = np.asarray(box_corners(box))
    # after 90deg CCW rotation: (2,1)->(-1,2), (-2,1)->(-1,-2), ...
    expected = np.array([[-1.0, 2.0], [-1.0, -2.0], [1.0, -2.0], [1.0, 2.0]])
    np.testing.assert_allclose(c, expected, atol=1e-6)


def test_corners_shoelace_area_matches():
    rng = np.random.default_rng(0)
    boxes = np.stack(
        [
            rng.uniform(-10, 10, 64),
            rng.uniform(-10, 10, 64),
            rng.uniform(0.5, 6, 64),
            rng.uniform(0.5, 3, 64),
            rng.uniform(-np.pi, np.pi, 64),
        ],
        axis=-1,
    ).astype(np.float32)
    c = np.asarray(box_corners(jnp.asarray(boxes)))
    x, y = c[..., 0], c[..., 1]
    shoelace = 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=-1) - np.roll(x, -1, axis=-1) * y, axis=-1)
    )
    np.testing.assert_allclose(shoelace, np.asarray(box_area(jnp.asarray(boxes))), rtol=1e-4)


def test_codec_roundtrip():
    rng = np.random.default_rng(1)
    n = 256
    gt = np.stack(
        [
            rng.uniform(-30, 30, n),
            rng.uniform(-30, 30, n),
            rng.uniform(1, 6, n),
            rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    anchors = np.stack(
        [
            gt[:, 0] + rng.uniform(-1, 1, n),
            gt[:, 1] + rng.uniform(-1, 1, n),
            np.full(n, 4.0),
            np.full(n, 2.0),
            np.zeros(n),
        ],
        axis=-1,
    ).astype(np.float32)
    code = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    rec = np.asarray(decode_boxes(code, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec[:, :4], gt[:, :4], rtol=1e-4, atol=1e-4)
    # yaw recovered modulo 2pi
    dyaw = np.angle(np.exp(1j * (rec[:, 4] - gt[:, 4])))
    np.testing.assert_allclose(dyaw, np.zeros(n), atol=1e-4)
