"""Convolutional GRU cell.

TPU-native replacement for the reference's custom convolutional RNN
library († coperception/utils/convolutional_rnn/{module,functional}.py,
SURVEY.md §2.1), of which V2VNet uses only the Conv2d GRU cell. Instead
of an autograd-level re-implementation, this is a plain flax module whose
gates are fused NHWC convs — XLA fuses the elementwise gate math into the
conv epilogues, and `jax.grad` provides the backward pass.
"""

from __future__ import annotations

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
