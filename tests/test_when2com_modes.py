"""When2com / who2com inference-mode behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.models.det.when2com import When2comFusion

GRID = GridConfig(voxel_size=(2.0, 2.0, 1.25))


def _setup(argmax_mode, train, mask=None):
    rng = np.random.default_rng(0)
    b, a, h, w, c = 1, 3, 8, 8, 16
    feats = jnp.asarray(rng.standard_normal((b, a, h, w, c)).astype(np.float32))
    trans = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1)))
    if mask is None:
        mask = np.ones((b, a), bool)
    mask = jnp.asarray(mask)
    mod = When2comFusion(GRID, argmax_mode=argmax_mode)
    v = mod.init(jax.random.PRNGKey(0), feats, trans, mask, train=train)
    out = mod.apply(v, feats, trans, mask, train=train)
    return np.asarray(out)


def test_train_and_eval_modes_run_finite():
    for argmax in (False, True):
        for train in (True, False):
            out = _setup(argmax, train)
            assert np.isfinite(out).all()


def test_padded_agent_contributes_nothing():
    """Masking an agent must not change other agents' fused output when
    its attention weight is forced to zero."""
    mask_full = np.ones((1, 3), bool)
    mask_drop = mask_full.copy()
    mask_drop[0, 2] = False
    rng = np.random.default_rng(1)
    b, a, h, w, c = 1, 3, 8, 8, 16
    feats = rng.standard_normal((b, a, h, w, c)).astype(np.float32)
    feats2 = feats.copy()
    feats2[0, 2] = 999.0  # garbage in the masked agent's features
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    mod = When2comFusion(GRID)
    v = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(feats),
        jnp.asarray(trans),
        jnp.asarray(mask_drop),
        train=True,
    )
    o1 = mod.apply(v, jnp.asarray(feats), jnp.asarray(trans), jnp.asarray(mask_drop), train=True)
    o2 = mod.apply(v, jnp.asarray(feats2), jnp.asarray(trans), jnp.asarray(mask_drop), train=True)
    # Agents 0/1 unaffected by agent 2's garbage.
    np.testing.assert_allclose(
        np.asarray(o1)[0, :2], np.asarray(o2)[0, :2], atol=2e-4
    )


def test_who2com_single_agent_keeps_full_self_weight():
    """Review round-2: an ego with NO valid non-self partner must keep
    its full features at who2com eval — argmax over an all-masked row
    previously picked a padded agent and silently halved the ego map."""
    mask = np.zeros((1, 3), bool)
    mask[0, 0] = True  # only agent 0 is real
    out = _setup(argmax_mode=True, train=False, mask=mask)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 3, 8, 8, 16)).astype(np.float32)
    np.testing.assert_allclose(out[0, 0], feats[0, 0], atol=1e-4)
