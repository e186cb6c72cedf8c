"""MGDA multi-task gradient balancing (min-norm Frank–Wolfe solver).

Analog of the reference's `MinNormSolver` + gradient normalizers
(† coperception/utils/min_norm_solvers.py, SURVEY.md §2.1), used by
`FaFModule` when `--MGDA` is set to balance the cls/loc (and KD) task
gradients.

TPU-first: the solver runs entirely in jnp on the (T, T) Gram matrix of
flattened task gradients — T is 2 or 3, so this is trivial compute, but
keeping it on device avoids a host sync inside the train step. The
two-task case uses the closed form; T > 2 runs a fixed number of
Frank–Wolfe iterations (static loop, jit-friendly).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _min_norm_2d(v1v1, v1v2, v2v2):
    """Closed-form min-norm point on the segment between two gradients."""
    gamma = (v2v2 - v1v2) / jnp.maximum(v1v1 + v2v2 - 2 * v1v2, 1e-12)
    gamma = jnp.clip(gamma, 0.0, 1.0)
    return jnp.stack([gamma, 1.0 - gamma])


def min_norm_weights(gram: jnp.ndarray, iters: int = 32) -> jnp.ndarray:
    """Weights of the min-norm point in the convex hull of task gradients.

    Args:
      gram: (T, T) Gram matrix G_ij = <g_i, g_j> of task gradients.
      iters: Frank–Wolfe iterations for T > 2.

    Returns:
      (T,) simplex weights.
    """
    t = gram.shape[0]
    if t == 1:
        return jnp.ones(1, gram.dtype)
    if t == 2:
        return _min_norm_2d(gram[0, 0], gram[0, 1], gram[1, 1])

    def body(w, _):
        # Frank–Wolfe: move toward the vertex with the most negative
        # directional derivative.
        grad = gram @ w
        idx = jnp.argmin(grad)
        v = jax.nn.one_hot(idx, t, dtype=gram.dtype)
        d = v - w
        # Exact line search on the quadratic.
        denom = d @ gram @ d
        step = jnp.clip(-(w @ gram @ d) / jnp.maximum(denom, 1e-12), 0.0, 1.0)
        return w + step * d, None

    w0 = jnp.full((t,), 1.0 / t, gram.dtype)
    w, _ = jax.lax.scan(body, w0, None, length=iters)
    return w


def gram_matrix(grads: Sequence) -> jnp.ndarray:
    """Gram matrix of a list of gradient pytrees."""
    flats = [
        jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g)])
        for g in grads
    ]
    stacked = jnp.stack(flats)  # (T, P)
    return stacked @ stacked.T


def combine_grads(grads: Sequence, weights: jnp.ndarray):
    """Weighted sum of gradient pytrees."""
    return jax.tree.map(
        lambda *gs: sum(w * g for w, g in zip(weights, gs)), *grads
    )


def mgda_grads(grads: Sequence, normalize: bool = True):
    """Full MGDA step: (optionally loss-scale-normalized) min-norm combo.

    Args:
      grads: list of per-task gradient pytrees.
      normalize: l2-normalize each task gradient first (the reference's
        'l2' normalization mode).

    Returns:
      (combined_grads, weights).
    """
    if normalize:
        def nrm(g):
            n = jnp.sqrt(
                sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
            )
            return jax.tree.map(lambda x: x / jnp.maximum(n, 1e-12), g)

        grads = [nrm(g) for g in grads]
    weights = min_norm_weights(gram_matrix(grads))
    return combine_grads(grads, weights), weights
