"""Convolutional RNN library: 1d/2d/3d vanilla/GRU/LSTM cells + wrappers.

TPU-native replacement for the reference's vendored convolutional_rnn
package († coperception/utils/convolutional_rnn/{module,functional}.py,
SURVEY.md §2.1 — ~800 LoC of autograd-level gate math for Conv{1,2,3}d
x {RNN, GRU, LSTM} x {cell, multi-layer sequence, bidirectional}).

Design differences from the reference, on purpose:
  * Cells are plain flax modules whose gates are ONE fused channel-last
    conv per gate group — XLA fuses the sigmoid/tanh gate math into the
    conv epilogue, and `jax.grad` supplies the backward pass (the
    reference hand-maintains functional backward variants).
  * The sequence wrapper is `nn.scan` over the time axis — a single
    compiled loop body regardless of sequence length (the reference
    python-loops over timesteps, re-dispatching every step).
  * Spatial rank is a parameter (`ndim`), not a class-name suffix: flax
    convs are rank-agnostic, so Conv1d/2d/3d share one implementation.
    Name-style aliases (Conv2dGRU, ...) are provided for discoverability.

Layouts are channel-last ((B, *spatial, C)) throughout — the TPU-native
conv layout; the reference is NCHW.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _kernel(ndim: int, kernel: Union[int, Sequence[int]]) -> Tuple[int, ...]:
    if isinstance(kernel, int):
        return (kernel,) * ndim
    k = tuple(kernel)
    assert len(k) == ndim, f"kernel {k} does not match ndim={ndim}"
    return k


class ConvRNNCellBase(nn.Module):
    """Shared config for convolutional recurrent cells.

    features: hidden/output channel count.
    ndim: spatial rank (1, 2, or 3).
    kernel: conv kernel size (int or per-dim tuple).
    dtype: computation dtype (None = infer; pass jnp.bfloat16 for MXU).
    """

    features: int
    ndim: int = 2
    kernel: Union[int, Sequence[int]] = 3
    dtype: Any = None

    def _conv(self, out: int, name: str):
        return nn.Conv(
            out, _kernel(self.ndim, self.kernel), name=name, dtype=self.dtype
        )

    def init_state(self, batch_spatial: Sequence[int]):
        """Zero hidden state for input of shape (B, *spatial, C)."""
        shape = tuple(batch_spatial) + (self.features,)
        return jnp.zeros(shape, self.dtype or jnp.float32)


class ConvRNNCell(ConvRNNCellBase):
    """Vanilla convolutional RNN step: h' = act(conv([h, x])).

    († convolutional_rnn.Conv2dRNN — nonlinearity 'tanh' or 'relu'.)
    """

    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        assert self.nonlinearity in ("tanh", "relu"), self.nonlinearity
        act = jnp.tanh if self.nonlinearity == "tanh" else nn.relu
        return act(self._conv(self.features, "gate")(
            jnp.concatenate([h, x], axis=-1)
        ))


class ConvGRUCell(ConvRNNCellBase):
    """Convolutional GRU step († convolutional_rnn.Conv2dGRU).

    The cell V2VNet's message-passing rounds use (models/det/v2vnet.py);
    gate math golden-pinned in tests/test_convrnn.py. ndim in {1, 2, 3}.
    """

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        hx = jnp.concatenate([h, x], axis=-1)
        zr = self._conv(2 * self.features, "gates")(hx)
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        cand = self._conv(self.features, "candidate")(
            jnp.concatenate([r * h, x], axis=-1)
        )
        # Numerical-health tap (v2v production-geometry diagnostic): gate
        # means + saturation fractions + magnitudes, one row per call
        # (= per GNN round). Dead code unless apply() is called with
        # mutable=["diagnostics"] — sow into an unrequested collection
        # stores nothing and XLA DCEs the stats.
        f32 = lambda t: t.astype(jnp.float32)
        self.sow(
            "diagnostics",
            "gru_stats",
            jnp.stack([
                f32(z).mean(),
                (f32(z) > 0.99).mean(),
                (f32(z) < 0.01).mean(),
                f32(r).mean(),
                jnp.abs(f32(jnp.tanh(cand))).mean(),
                jnp.abs(f32(h)).mean(),
                jnp.abs(f32(x)).mean(),
            ]),
        )
        return (1.0 - z) * h + z * jnp.tanh(cand)


class ConvLSTMCell(ConvRNNCellBase):
    """Convolutional LSTM step († convolutional_rnn.Conv2dLSTM).

    State is (h, c); all four gates come from one fused conv.
    """

    @nn.compact
    def __call__(
        self, state: Tuple[Array, Array], x: Array
    ) -> Tuple[Array, Array]:
        h, c = state
        gates = self._conv(4 * self.features, "gates")(
            jnp.concatenate([h, x], axis=-1)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h2 = nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2

    def init_state(self, batch_spatial: Sequence[int]):
        z = super().init_state(batch_spatial)
        return (z, z)


_CELLS = {"rnn": ConvRNNCell, "gru": ConvGRUCell, "lstm": ConvLSTMCell}


class ConvRNN(nn.Module):
    """Multi-layer (optionally bidirectional) convolutional RNN over a
    sequence — the reference's Conv2dGRU/Conv2dLSTM module surface
    († convolutional_rnn/module.py: num_layers, bidirectional, batch_first).

    Input: (B, T, *spatial, C_in). Output: (B, T, *spatial, H) where
    H = features * (2 if bidirectional else 1); plus the final hidden
    state per layer/direction.

    The time loop is `nn.scan` — one compiled body, hidden state carried
    functionally; layers are python-unrolled (static, small count).
    """

    features: int
    cell: str = "gru"  # 'rnn' | 'gru' | 'lstm'
    ndim: int = 2
    kernel: Union[int, Sequence[int]] = 3
    num_layers: int = 1
    bidirectional: bool = False
    nonlinearity: str = "tanh"  # vanilla-RNN only
    dtype: Any = None

    def _make_cell(self, name: str):
        cls = _CELLS[self.cell]
        kw = dict(
            features=self.features, ndim=self.ndim, kernel=self.kernel,
            dtype=self.dtype, name=name,
        )
        if self.cell == "rnn":
            kw["nonlinearity"] = self.nonlinearity
        return cls(**kw)

    @nn.compact
    def __call__(
        self, x: Array, initial_state: Optional[Sequence[Any]] = None
    ):
        assert x.ndim == self.ndim + 3, (
            f"expected (B, T, {'spatial, ' * self.ndim}C), got {x.shape}"
        )
        b = x.shape[0]
        spatial = x.shape[2:-1]
        dirs = 2 if self.bidirectional else 1

        if self.cell == "lstm":
            def body(c, h, xt):
                new = c(h, xt)
                return new, new[0]  # carry (h, c); emit h
        else:
            def body(c, h, xt):
                new = c(h, xt)
                return new, new  # carry == emit == h

        # Broadcast params across time; carry the hidden state.
        scan_fn = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )

        states_out = []
        seq = x
        for layer in range(self.num_layers):
            outs = []
            for d in range(dirs):
                cell = self._make_cell(f"l{layer}_d{d}")
                h0 = (
                    initial_state[layer * dirs + d]
                    if initial_state is not None
                    else cell.init_state((b,) + spatial)
                )
                inp = jnp.flip(seq, axis=1) if d == 1 else seq
                hN, ys = scan_fn(cell, h0, inp)
                if d == 1:
                    ys = jnp.flip(ys, axis=1)
                outs.append(ys)
                states_out.append(hN)
            seq = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
        return seq, tuple(states_out)


def _alias(cell: str, ndim: int):
    def make(features, **kw):
        return ConvRNN(features=features, cell=cell, ndim=ndim, **kw)

    return make


#: Reference-style constructors: Conv{1,2,3}d{RNN,GRU,LSTM}(features, ...).
Conv1dRNN = _alias("rnn", 1)
Conv2dRNN = _alias("rnn", 2)
Conv3dRNN = _alias("rnn", 3)
Conv1dGRU = _alias("gru", 1)
Conv2dGRU = _alias("gru", 2)
Conv3dGRU = _alias("gru", 3)
Conv1dLSTM = _alias("lstm", 1)
Conv2dLSTM = _alias("lstm", 2)
Conv3dLSTM = _alias("lstm", 3)
