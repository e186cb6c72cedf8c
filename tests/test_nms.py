"""NMS vs a naive O(n^2) host reference."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.ops.nms import batched_nms, nms
from tests.oracles import np_rotated_iou


def naive_nms(boxes, scores, valid, thr):
    order = np.argsort(-np.where(valid, scores, -np.inf))
    kept = []
    for i in order:
        if not valid[i]:
            continue
        if all(np_rotated_iou(boxes[i], boxes[j]) <= thr for j in kept):
            kept.append(i)
    return {tuple(np.round(boxes[i], 4)) for i in kept}


def test_nms_matches_naive():
    rng = np.random.default_rng(0)
    n = 48
    boxes = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-10, 10, n),
            rng.uniform(2, 5, n),
            rng.uniform(1, 2.5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        -1,
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.15
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2)
    got = {
        tuple(np.round(np.asarray(res.boxes[i]), 4))
        for i in range(n)
        if bool(res.valid[i])
    }
    want = naive_nms(boxes, scores, valid, 0.2)
    assert got == want


def test_nms_keeps_best_of_cluster():
    boxes = np.array(
        [[0, 0, 4, 2, 0.1], [0.2, 0, 4, 2, 0.1], [20, 20, 4, 2, 0.0]],
        np.float32,
    )
    scores = np.array([0.9, 0.95, 0.5], np.float32)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.3)
    kept = np.asarray(res.boxes)[np.asarray(res.valid)]
    assert len(kept) == 2
    assert any(np.allclose(k, boxes[1]) for k in kept)  # higher score wins
    assert any(np.allclose(k, boxes[2]) for k in kept)


def test_batched_nms_shapes():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(-5, 5, (2, 3, 16, 5)).astype(np.float32)
    boxes[..., 2:4] = np.abs(boxes[..., 2:4]) + 1
    scores = rng.uniform(0, 1, (2, 3, 16)).astype(np.float32)
    valid = np.ones((2, 3, 16), bool)
    res = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    assert res.boxes.shape == (2, 3, 16, 5)
    assert res.valid.shape == (2, 3, 16)
