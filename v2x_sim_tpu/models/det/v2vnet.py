"""V2VNet spatial GNN message passing.

Rebuild of † coperception/models/det/V2VNet.py (SURVEY.md §2.1): a fully
connected GNN over agents where, per round, each agent warps its
neighbors' current hidden maps into its own frame, encodes pairwise
messages, aggregates them, and updates its hidden state with a ConvGRU;
~3 rounds, then the decoder resumes.

TPU-first: one round = one all-pairs batched warp + one folded conv over
(B*A*A) pairs + a masked mean + one ConvGRU step over (B*A); rounds are a
static Python unroll (round count is a hyperparameter, not data), so XLA
sees a straight-line graph it can fuse and pipeline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import GridConfig
from v2x_sim_tpu.models.convrnn import ConvGRUCell
from v2x_sim_tpu.models.det.fusion import warp_neighbors


class V2VNetFusion(nn.Module):
    """Multi-round GNN fusion with ConvGRU state updates."""

    grid: GridConfig
    rounds: int = 3  # VERIFY vs reference († V2VNet.py message rounds)
    #: Opt-in GroupNorm on the aggregated message before the GRU. The
    #: reference has no message normalization (default off for parity),
    #: but without it constant-lr training at full width can blow the
    #: message magnitudes up (|x| ~90 by step 150) and pin every GRU
    #: gate — docs/V2V_DIAGNOSIS.md. Bounded messages make v2v robust
    #: to the lr schedule.
    msg_norm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feats, trans, mask, train: bool = True):
        b, a, h, w, c = feats.shape
        gru = ConvGRUCell(features=c, name="conv_gru", dtype=self.dtype)
        msg_conv1 = nn.Conv(c, (3, 3), name="msg_hidden", dtype=self.dtype)
        msg_conv2 = nn.Conv(c, (3, 3), name="msg_out", dtype=self.dtype)
        norm = (
            nn.GroupNorm(num_groups=min(32, c), name="msg_norm",
                         dtype=self.dtype)
            if self.msg_norm
            else None
        )

        not_self = (1.0 - jnp.eye(a, dtype=feats.dtype))[None, :, :, None, None, None]
        valid_src = mask[:, None, :, None, None, None].astype(feats.dtype)
        pair_w = not_self * valid_src  # exclude self, exclude padding
        # Per-ego neighbor count for the masked mean.
        n_nbr = jnp.maximum(jnp.sum(pair_w[..., 0, 0, 0], axis=2), 1.0)

        state = feats
        for _ in range(self.rounds):
            warped = warp_neighbors(state, trans, mask, self.grid)
            ego = jnp.broadcast_to(state[:, :, None], warped.shape)
            pair = jnp.concatenate([warped, ego], axis=-1)
            msg = nn.relu(msg_conv1(pair))
            msg = nn.relu(msg_conv2(msg))
            agg = jnp.sum(msg * pair_w, axis=2) / n_nbr[..., None, None, None]
            if norm is not None:
                agg = norm(agg.reshape(b * a, h, w, c)).reshape(
                    b, a, h, w, c
                )
            state = gru(state, agg)
        return state
