"""Ego-frame warp vs torch grid_sample (align_corners=False) oracle.

SURVEY.md §7 hard parts: grid_sample semantics must match for checkpoint
parity; torch-cpu is the installed numerical oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.ops.warp import warp_all_pairs, warp_features

GRID = GridConfig(voxel_size=(1.0, 1.0, 0.625))  # symmetric 64x64 extents


def _torch_warp(feats_hwc, rot, trans_xy):
    """Oracle: torch affine_grid + grid_sample with the equivalent theta."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    h, w, c = feats_hwc.shape
    (x0, x1), _ = GRID.area_extents[0], GRID.area_extents[1]
    s = (x1 - x0) / 2.0  # symmetric extents: Sx == Sy
    r = rot
    t = trans_xy
    # Derivation in tests/test_warp.py history: torch grid x == our col (y),
    # torch grid y == our row (x); normalized->metric scale s, mid 0.
    theta = torch.tensor(
        [
            [r[1, 1], r[1, 0], t[1] / s],
            [r[0, 1], r[0, 0], t[0] / s],
        ],
        dtype=torch.float32,
    )[None]
    x = torch.from_numpy(feats_hwc.transpose(2, 0, 1))[None]  # NCHW
    grid = TF.affine_grid(theta, [1, c, h, w], align_corners=False)
    out = TF.grid_sample(
        x, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    return out[0].numpy().transpose(1, 2, 0)


@pytest.mark.parametrize("yaw,tx,ty", [(0.0, 4.0, 0.0), (0.5, -3.0, 2.0), (-1.2, 0.0, 0.0)])
def test_warp_matches_torch(yaw, tx, ty):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((64, 64, 3)).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]], np.float32)
    t4 = np.eye(4, dtype=np.float32)
    t4[:2, :2] = rot
    t4[0, 3], t4[1, 3] = tx, ty
    got = np.asarray(warp_features(jnp.asarray(feats), jnp.asarray(t4), GRID))
    want = _torch_warp(feats, rot, np.array([tx, ty]))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_identity_roundtrip():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((32, 32, 2)).astype(np.float32)
    eye = jnp.eye(4)
    out = np.asarray(warp_features(jnp.asarray(feats), eye, GRID))
    np.testing.assert_allclose(out, feats, atol=1e-5)


def test_warp_all_pairs_diagonal_is_identity():
    rng = np.random.default_rng(2)
    b, a = 1, 3
    feats = rng.standard_normal((b, a, 16, 16, 4)).astype(np.float32)
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1, 0, 3] = 5.0  # some off-diagonal transform
    trans[0, 1, 0, 0, 3] = -5.0
    out = np.asarray(warp_all_pairs(jnp.asarray(feats), jnp.asarray(trans), GRID))
    assert out.shape == (b, a, a, 16, 16, 4)
    for i in range(a):
        np.testing.assert_allclose(out[0, i, i], feats[0, i], atol=1e-5)


def test_warp_inverse_composition():
    """Warping by T then by T^-1 ~ identity away from borders.

    Uses a smooth field: bilinear double-resampling of white noise would
    legitimately lose high frequencies."""
    xs, ys = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    feats = (
        np.sin(xs / 6.0) + np.cos(ys / 5.0) + 0.3 * np.sin((xs + ys) / 9.0)
    ).astype(np.float32)[..., None]
    yaw = 0.4
    c, s = np.cos(yaw), np.sin(yaw)
    t4 = np.eye(4, dtype=np.float32)
    t4[:2, :2] = [[c, -s], [s, c]]
    t4[0, 3] = 2.0
    inv = np.linalg.inv(t4).astype(np.float32)
    once = warp_features(jnp.asarray(feats), jnp.asarray(t4), GRID)
    back = np.asarray(warp_features(once, jnp.asarray(inv), GRID))
    # Interior region only (borders lose info to zero padding).
    err = np.abs(back[20:44, 20:44] - feats[20:44, 20:44])
    assert np.median(err) < 0.25  # bilinear double-resample smoothing

def test_onehot_path_matches_gather_path():
    """warp_all_pairs_onehot (MXU einsum) vs the gather path on random
    rigid transforms — identical math, different execution strategy."""
    import jax
    from v2x_sim_tpu.ops.warp import warp_all_pairs_onehot, warp_features

    rng = np.random.default_rng(3)
    b, a, h, w, c = 2, 4, 32, 32, 8
    feats = rng.standard_normal((b, a, h, w, c)).astype(np.float32)
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    for bi in range(b):
        for i in range(a):
            for j in range(a):
                if i == j:
                    continue
                yaw = rng.uniform(-1.5, 1.5)
                cy_, sy_ = np.cos(yaw), np.sin(yaw)
                trans[bi, i, j, :2, :2] = [[cy_, -sy_], [sy_, cy_]]
                trans[bi, i, j, :2, 3] = rng.uniform(-8, 8, 2)
    got = np.asarray(
        warp_all_pairs_onehot(jnp.asarray(feats), jnp.asarray(trans), GRID)
    )
    t_src = np.swapaxes(trans, 1, 2)
    want = np.stack([
        np.stack([
            np.stack([
                np.asarray(warp_features(
                    jnp.asarray(feats[bi, j]), jnp.asarray(t_src[bi, i, j]), GRID
                ))
                for j in range(a)
            ])
            for i in range(a)
        ])
        for bi in range(b)
    ])
    np.testing.assert_allclose(got, want, atol=1e-4)
