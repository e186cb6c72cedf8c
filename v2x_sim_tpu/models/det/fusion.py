"""Intermediate-fusion strategies over the static agent axis.

Rebuilds the reference's fusion menu (SURVEY.md §2.1:
† coperception/models/det/{Sum,Mean,Max,Cat,AgentWiseWeighted}Fusion.py and
DiscoNet.py) as pure functions / small flax modules with one shared
contract:

    fuse(feats[B, A, h, w, C], trans[B, A, A, 4, 4], mask[B, A]) ->
        fused[B, A, h, w, C]

where every agent simultaneously acts as ego: the full (A_ego, A_src)
pairwise warp is ONE batched gather (`ops.warp.warp_all_pairs`) and the
combine is masked reductions/softmaxes over the source-agent axis — no
Python loop over agents, no inter-chip traffic (SURVEY.md §2.4).

Padded agents (mask=False) contribute nothing: their features are zeroed
and they are excluded from means/softmaxes, so gradients cannot leak
through padding (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.ops.warp import warp_all_pairs

NEG_INF = -1e9


def _src_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, A) -> (B, 1, A, 1, 1, 1) broadcast mask over warped pairs."""
    return mask[:, None, :, None, None, None]


def warp_neighbors(feats, trans, mask, grid: GridConfig):
    """All-pairs warp with padded sources zeroed: (B, Ai, Aj, h, w, C)."""
    warped = warp_all_pairs(feats, trans, grid)
    return warped * _src_mask(mask).astype(feats.dtype)


def fuse_sum(feats, trans, mask, grid):
    """SumFusion: elementwise sum of warped neighbor maps."""
    return jnp.sum(warp_neighbors(feats, trans, mask, grid), axis=2)


def fuse_mean(feats, trans, mask, grid):
    """MeanFusion: masked mean over real agents."""
    s = jnp.sum(warp_neighbors(feats, trans, mask, grid), axis=2)
    n = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return s / n[:, None, None, None, None].astype(feats.dtype)


def fuse_max(feats, trans, mask, grid):
    """MaxFusion: elementwise max; padded agents masked to -inf."""
    warped = warp_all_pairs(feats, trans, grid)
    warped = jnp.where(_src_mask(mask), warped, NEG_INF)
    return jnp.max(warped, axis=2)


class CatFusion(nn.Module):
    """CatFusion: channel-concat all warped agents, 1x1-conv back to C.

    The reference concatenates a Python list of A maps; here the A axis is
    folded into channels with a reshape, and the compression conv is one
    big MXU matmul.
    """

    grid: GridConfig
    dtype: object = None

    @nn.compact
    def __call__(self, feats, trans, mask, train: bool = True):
        b, a, h, w, c = feats.shape
        warped = warp_neighbors(feats, trans, mask, self.grid)
        x = jnp.moveaxis(warped, 2, -2).reshape(b, a, h, w, a * c)
        return nn.relu(nn.Conv(c, (1, 1), name="compress", dtype=self.dtype)(x))


class AgentWiseWeightedFusion(nn.Module):
    """AgentWiseWeightedFusion: one learned scalar weight per (ego, src)
    pair from globally-pooled pair features, softmaxed over sources."""

    grid: GridConfig
    dtype: object = None

    @nn.compact
    def __call__(self, feats, trans, mask, train: bool = True):
        b, a, h, w, c = feats.shape
        warped = warp_neighbors(feats, trans, mask, self.grid)
        ego = jnp.broadcast_to(feats[:, :, None], warped.shape)
        pooled = jnp.mean(
            jnp.concatenate([ego, warped], axis=-1), axis=(3, 4)
        )  # (B, Ai, Aj, 2C)
        s = nn.Dense(32, name="score_hidden", dtype=self.dtype)(pooled)
        s = nn.relu(s)
        s = nn.Dense(1, name="score", dtype=self.dtype)(s)[..., 0]  # (B, Ai, Aj)
        s = jnp.where(mask[:, None, :], s, NEG_INF)
        attn = nn.softmax(s, axis=-1)
        return jnp.einsum("baj,bajhwc->bahwc", attn, warped)


class DiscoFusion(nn.Module):
    """DiscoNet pixel-weighted fusion
    († coperception/models/det/DiscoNet.py `PixelWeightedFusionSoftmax`):
    a 1x1-conv edge encoder scores each (ego, warped-src) pair per pixel,
    softmax across sources, weighted sum."""

    grid: GridConfig
    dtype: object = None

    @nn.compact
    def __call__(self, feats, trans, mask, train: bool = True):
        warped = warp_neighbors(feats, trans, mask, self.grid)
        ego = jnp.broadcast_to(feats[:, :, None], warped.shape)
        pair = jnp.concatenate([ego, warped], axis=-1)
        s = nn.Conv(32, (1, 1), name="edge_hidden", dtype=self.dtype)(pair)
        s = nn.relu(s)
        s = nn.Conv(1, (1, 1), name="edge_score", dtype=self.dtype)(s)  # (B, Ai, Aj, h, w, 1)
        s = jnp.where(_src_mask(mask), s, NEG_INF)
        attn = nn.softmax(s, axis=2)
        return jnp.sum(attn * warped, axis=2)
