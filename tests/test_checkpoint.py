"""Checkpoint save/restore round-trip and late fusion (ops.postprocess).

Covers the two CLI-surface paths that had no direct unit tests: orbax
checkpointing (train/checkpoint.py — reference per-epoch torch.save +
--resume, SURVEY.md §5) and test-time late fusion (ops/postprocess.py —
reference test_codet late-fusion mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from v2x_sim_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from v2x_sim_tpu.train.det_module import TrainState


def _tiny_state(seed):
    k = jax.random.PRNGKey(seed)
    params = {
        "conv": {"kernel": jax.random.normal(k, (3, 3, 4, 8))},
        "bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }
    return TrainState(
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros((8,)), "var": jnp.ones((8,))}},
        opt_state={"count": jnp.zeros((), jnp.int32)},
        step=jnp.asarray(seed, jnp.int32),
    )


def test_checkpoint_round_trip(tmp_path):
    state = _tiny_state(3)
    path = save_checkpoint(str(tmp_path), state, step=3)
    restored = restore_checkpoint(path, _tiny_state(0))
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_latest_checkpoint_picks_max_epoch(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for step in (1, 10, 2):
        save_checkpoint(str(tmp_path), _tiny_state(step), step=step)
    best = latest_checkpoint(str(tmp_path))
    assert best is not None and best.endswith("epoch_10")


def test_late_fuse_merges_peer_boxes():
    """A box detected only by agent 1 must appear in agent 0's merged set,
    expressed in agent 0's frame; masked agents contribute nothing."""
    from v2x_sim_tpu.ops.postprocess import late_fuse

    b, a, k = 1, 2, 4
    boxes = np.zeros((b, a, k, 5), np.float32)
    scores = np.zeros((b, a, k), np.float32)
    valid = np.zeros((b, a, k), bool)
    # Agent 1 detects one box at (2, 0) in ITS frame.
    boxes[0, 1, 0] = (2.0, 0.0, 4.0, 2.0, 0.0)
    scores[0, 1, 0] = 0.9
    valid[0, 1, 0] = True

    # Agent 1 sits 10 m ahead of agent 0 on x: T_{0<-1} translates +10.
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1, 0, 3] = 10.0
    trans[0, 1, 0, 0, 3] = -10.0
    agent_mask = np.ones((b, a), bool)

    res = late_fuse(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(trans), jnp.asarray(agent_mask),
    )
    kept0 = np.asarray(res.boxes[0, 0])[np.asarray(res.valid[0, 0])]
    assert len(kept0) == 1
    np.testing.assert_allclose(kept0[0][:2], (12.0, 0.0), atol=1e-5)

    # Same box in agent 1's own frame stays at (2, 0).
    kept1 = np.asarray(res.boxes[0, 1])[np.asarray(res.valid[0, 1])]
    np.testing.assert_allclose(kept1[0][:2], (2.0, 0.0), atol=1e-5)

    # Masking agent 1 removes its contribution everywhere.
    res2 = late_fuse(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(trans), jnp.asarray(np.array([[True, False]])),
    )
    assert not np.asarray(res2.valid[0, 0]).any()
