"""Pallas IoU kernel (interpret mode on CPU) vs the XLA S-H version."""

import numpy as np
import jax.numpy as jnp
import pytest

from v2x_sim_tpu.ops import iou_sh


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


def test_tile_math_matches_iou_sh():
    """The kernel's tile function (pure jnp) must equal iou_sh exactly;
    the pallas_call wrapper only changes data movement."""
    from v2x_sim_tpu.ops.pallas.iou_pl import _iou_tile

    rng = np.random.default_rng(0)
    n = 8 * 128
    a = _random_boxes(rng, n)
    b = _random_boxes(rng, n)
    args_a = [jnp.asarray(a[:, i].reshape(8, 128)) for i in range(5)]
    args_b = [jnp.asarray(b[:, i].reshape(8, 128)) for i in range(5)]
    got = np.asarray(_iou_tile(*args_a, *args_b)).reshape(-1)
    want = np.asarray(iou_sh.rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_call_interpret_mode():
    """Run the actual pallas_call in interpreter mode (CPU-safe)."""
    from jax.experimental.pallas import tpu as pltpu

    from v2x_sim_tpu.ops.pallas import iou_pl

    rng = np.random.default_rng(1)
    n = 200  # exercises padding to the tile size
    a = _random_boxes(rng, n)
    b = _random_boxes(rng, n)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            iou_pl.rotated_iou_pairs(jnp.asarray(a), jnp.asarray(b))
        )
    want = np.asarray(iou_sh.rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)
