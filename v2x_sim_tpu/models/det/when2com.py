"""When2com / Who2com learned communication gating.

Rebuild of † coperception/models/det/When2com.py (SURVEY.md §2.1): each
agent produces a small query and a large key from a conv `query_key_net`;
a general dot-product attention over the A x A agent graph decides *when*
(when2com: soft attention + threshold) or *with whom* (who2com: argmax
partner selection) to communicate; the fused map is the attention-weighted
sum of ego-frame-warped neighbor features.

TPU-first: queries/keys for all B*A agents come from one folded conv
stack; the attention is a single (B, A, A) einsum; both inference modes
are branch-free masks over the same soft attention so the whole module
stays inside one jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.models.det.fusion import NEG_INF, warp_neighbors

#: Query/key sizes.  # VERIFY vs reference († When2com.py: query_size/key_size)
QUERY_DIM = 32
KEY_DIM = 256


class QueryKeyNet(nn.Module):
    """Conv stack pooling a BEV feature map to (query, key) vectors."""

    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        for ch in (64, 128, 256):
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        v = jnp.mean(x, axis=(-3, -2))  # global average pool
        query = nn.Dense(QUERY_DIM, name="query_proj", dtype=self.dtype)(v)
        key = nn.Dense(KEY_DIM, name="key_proj", dtype=self.dtype)(v)
        return query, key


class When2comFusion(nn.Module):
    """Attention-gated fusion.

    Attributes:
      grid: BEV metric extents for the warp.
      argmax_mode: who2com hard partner selection (reference
        `inference='argmax_test'`) instead of soft attention.
      threshold: when2com link pruning — soft weights below uniform
        (1/A) are zeroed at inference (reference `inference='activated'`).
      warp_flag: warp requested features into the ego frame before
        combining (reference `--warp_flag`); without it, raw neighbor
        maps are mixed (the degraded ablation the reference supports).
    """

    grid: GridConfig
    argmax_mode: bool = False
    threshold: bool = True
    warp_flag: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, feats, trans, mask, train: bool = True):
        b, a, h, w, c = feats.shape
        q, k = QueryKeyNet(name="query_key_net", dtype=self.dtype)(
            feats.reshape(b * a, h, w, c), train
        )
        q = q.reshape(b, a, -1)
        k = k.reshape(b, a, -1)
        # General dot-product attention: score_ij = q_i^T W k_j.
        wk = nn.Dense(QUERY_DIM, use_bias=False, name="attn_w", dtype=self.dtype)(k)
        scores = jnp.einsum("biq,bjq->bij", q, wk) / jnp.sqrt(
            jnp.asarray(QUERY_DIM, feats.dtype)
        )
        scores = jnp.where(mask[:, None, :], scores, NEG_INF)
        attn = nn.softmax(scores, axis=-1)  # (B, Ai, Aj)

        if not train:
            if self.argmax_mode:
                # who2com: keep only the single best partner (plus self).
                partner_scores = jnp.where(
                    jnp.eye(a, dtype=bool)[None], NEG_INF, scores
                )
                best = jnp.argmax(partner_scores, axis=-1)
                hard = nn.one_hot(best, a, dtype=attn.dtype)
                # An ego with no valid non-self partner (single real
                # agent) keeps full self weight — otherwise argmax over
                # an all-NEG_INF row picks a padded agent whose (zeroed)
                # features would silently halve the ego's own.
                has_partner = (
                    jnp.max(partner_scores, axis=-1) > NEG_INF / 2
                )[..., None].astype(attn.dtype)
                self_hot = jnp.eye(a, dtype=attn.dtype)[None]
                attn = (
                    0.5 * (hard * has_partner + self_hot)
                    + 0.5 * self_hot * (1.0 - has_partner)
                )
            elif self.threshold:
                # when2com 'activated': prune links weaker than uniform.
                keep = attn >= (1.0 / jnp.maximum(jnp.sum(mask, 1), 1.0))[
                    :, None, None
                ]
                keep = keep | jnp.eye(a, dtype=bool)[None]
                attn = attn * keep
                attn = attn / jnp.maximum(
                    jnp.sum(attn, axis=-1, keepdims=True), 1e-6
                )

        if self.warp_flag:
            warped = warp_neighbors(feats, trans, mask, self.grid)
        else:
            warped = jnp.broadcast_to(
                feats[:, None], (b, a, a, h, w, c)
            ) * mask[:, None, :, None, None, None].astype(feats.dtype)
        return jnp.einsum("bij,bijhwc->bihwc", attn, warped)
