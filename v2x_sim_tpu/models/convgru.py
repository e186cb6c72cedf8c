"""Convolutional GRU / LSTM cells.

TPU-native replacement for the reference's custom convolutional RNN
library († coperception/utils/convolutional_rnn/{module,functional}.py,
SURVEY.md §2.1): V2VNet uses the Conv2d GRU cell; the LSTM variant is
provided for library parity. Instead of an autograd-level
re-implementation, these are plain flax modules whose gates are fused
NHWC convs — XLA fuses the elementwise gate math into the conv
epilogues, and `jax.grad` provides the backward pass.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvGRUCell(nn.Module):
    """Single ConvGRU step: h' = GRU(h, x) with 3x3 conv gates."""

    features: int
    kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel, self.kernel)
        hx = jnp.concatenate([h, x], axis=-1)
        # One conv computes both update and reset gates (fused MXU matmul).
        zr = nn.Conv(2 * self.features, k, name="gates", dtype=self.dtype)(hx)
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        cand = nn.Conv(
            self.features, k, name="candidate", dtype=self.dtype
        )(jnp.concatenate([r * h, x], axis=-1))
        n = jnp.tanh(cand)
        return (1.0 - z) * h + z * n


class ConvLSTMCell(nn.Module):
    """Single ConvLSTM step: (h', c') = LSTM((h, c), x) with 3x3 conv
    gates; all four gates come from one fused conv
    († coperception/utils/convolutional_rnn — Conv2dLSTM)."""

    features: int
    kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(
        self, state: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, c = state
        k = (self.kernel, self.kernel)
        hx = jnp.concatenate([h, x], axis=-1)
        gates = nn.Conv(
            4 * self.features, k, name="gates", dtype=self.dtype
        )(hx)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h2 = nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2
