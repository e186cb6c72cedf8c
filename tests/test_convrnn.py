"""convolutional_rnn library surface (models/convrnn.py).

Parity target: † coperception/utils/convolutional_rnn (SURVEY.md §2.1
row 14) — Conv{1,2,3}d x {RNN, GRU, LSTM} cells, multi-layer sequence
wrapper, bidirectional. Oracle: the scanned sequence output must equal
a hand-rolled per-timestep loop over the same cell (same params), and
the GRU cell is golden-pinned against a numpy gate-math replica.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2x_sim_tpu.models.convrnn import (
    Conv1dGRU,
    Conv3dLSTM,
    ConvGRUCell,
    ConvLSTMCell,
    ConvRNN,
    ConvRNNCell,
)

B, T, H, W, C, F = 2, 4, 6, 5, 3, 7


def _x(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_scan_matches_stepwise_gru():
    """ConvRNN(gru) over T steps == manual loop with the same cell params."""
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="gru")
    vars_ = rnn.init(jax.random.PRNGKey(1), x)
    ys, (hN,) = rnn.apply(vars_, x)

    cell = ConvGRUCell(features=F)
    cell_vars = {"params": vars_["params"]["l0_d0"]}
    h = jnp.zeros((B, H, W, F))
    for t in range(T):
        h = cell.apply(cell_vars, h, x[:, t])
        np.testing.assert_allclose(
            np.asarray(ys[:, t]), np.asarray(h), atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(hN), np.asarray(h), atol=1e-5)


def test_gru_cell_golden_update_rule():
    """Pin the GRU gate math (the cell V2VNet uses) against a direct
    numpy evaluation of z/r/candidate from the cell's own parameters."""
    h = _x((B, H, W, F), 2)
    x = _x((B, H, W, C), 3)
    cell = ConvGRUCell(features=F, kernel=1)  # 1x1: exact numpy replica
    vars_ = cell.init(jax.random.PRNGKey(4), h, x)
    out = cell.apply(vars_, h, x)

    p = vars_["params"]
    hx = np.concatenate([np.asarray(h), np.asarray(x)], -1)
    zr = 1.0 / (1.0 + np.exp(-(
        hx @ np.asarray(p["gates"]["kernel"])[0, 0]
        + np.asarray(p["gates"]["bias"])
    )))
    z, r = zr[..., :F], zr[..., F:]
    rhx = np.concatenate([r * np.asarray(h), np.asarray(x)], -1)
    cand = np.tanh(
        rhx @ np.asarray(p["candidate"]["kernel"])[0, 0]
        + np.asarray(p["candidate"]["bias"])
    )
    want = (1.0 - z) * np.asarray(h) + z * cand
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_lstm_scan_matches_stepwise():
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="lstm")
    vars_ = rnn.init(jax.random.PRNGKey(5), x)
    ys, ((hN, cN),) = rnn.apply(vars_, x)

    cell = ConvLSTMCell(features=F)
    cell_vars = {"params": vars_["params"]["l0_d0"]}
    h = jnp.zeros((B, H, W, F))
    c = jnp.zeros((B, H, W, F))
    for t in range(T):
        h, c = cell.apply(cell_vars, (h, c), x[:, t])
    np.testing.assert_allclose(np.asarray(ys[:, -1]), np.asarray(h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hN), np.asarray(h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cN), np.asarray(c), atol=1e-5)


def test_vanilla_rnn_relu_nonlinearity():
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="rnn", nonlinearity="relu")
    vars_ = rnn.init(jax.random.PRNGKey(6), x)
    ys, _ = rnn.apply(vars_, x)
    assert ys.shape == (B, T, H, W, F)
    assert float(jnp.min(ys)) >= 0.0  # relu output


def test_bidirectional_output_and_reversal():
    """Forward half of a bidirectional run == unidirectional run with the
    same forward params; backward half == forward pass over reversed time."""
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="gru", bidirectional=True)
    vars_ = rnn.init(jax.random.PRNGKey(7), x)
    ys, states = rnn.apply(vars_, x)
    assert ys.shape == (B, T, H, W, 2 * F)
    assert len(states) == 2

    fwd = ConvRNN(features=F, cell="gru")
    ys_f, _ = fwd.apply(
        {"params": {"l0_d0": vars_["params"]["l0_d0"]}}, x
    )
    np.testing.assert_allclose(
        np.asarray(ys[..., :F]), np.asarray(ys_f), atol=1e-5
    )
    ys_b, _ = fwd.apply(
        {"params": {"l0_d0": vars_["params"]["l0_d1"]}},
        jnp.flip(x, axis=1),
    )
    np.testing.assert_allclose(
        np.asarray(ys[..., F:]), np.asarray(jnp.flip(ys_b, axis=1)),
        atol=1e-5,
    )


def test_multilayer_stacks():
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="gru", num_layers=3)
    vars_ = rnn.init(jax.random.PRNGKey(8), x)
    ys, states = rnn.apply(vars_, x)
    assert ys.shape == (B, T, H, W, F)
    assert len(states) == 3
    assert set(vars_["params"]) == {"l0_d0", "l1_d0", "l2_d0"}


@pytest.mark.parametrize(
    "maker,shape,out_tail",
    [
        (Conv1dGRU, (B, T, 9, C), (9, F)),
        (Conv3dLSTM, (B, T, 4, 5, 6, C), (4, 5, 6, F)),
    ],
)
def test_1d_3d_aliases(maker, shape, out_tail):
    x = _x(shape, 9)
    rnn = maker(F)
    vars_ = rnn.init(jax.random.PRNGKey(10), x)
    ys, _ = rnn.apply(vars_, x)
    assert ys.shape == (B, T) + out_tail
    assert np.isfinite(np.asarray(ys)).all()


def test_initial_state_is_respected():
    x = _x((B, T, H, W, C))
    rnn = ConvRNN(features=F, cell="gru")
    vars_ = rnn.init(jax.random.PRNGKey(11), x)
    h0 = jnp.full((B, H, W, F), 0.5)
    ys_a, _ = rnn.apply(vars_, x, initial_state=(h0,))
    ys_b, _ = rnn.apply(vars_, x)
    assert not np.allclose(np.asarray(ys_a[:, 0]), np.asarray(ys_b[:, 0]))
