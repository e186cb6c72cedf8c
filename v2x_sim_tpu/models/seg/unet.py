"""BEV semantic segmentation models.

Rebuild of the reference's seg family († coperception/models/seg/*.py,
SURVEY.md §2.1): a UNet encoder/decoder with the collaboration fusion
applied at the bottleneck, mirroring every det-side strategy (lowerbound,
upperbound/early-fusion input, naive fusions, when2com/who2com, V2VNet,
DiscoNet).

The fusion modules are shared with detection (models.det.fusion et al.)
because the contract is identical: (B, A, h, w, C) maps + pairwise
transforms + agent mask -> fused maps. NHWC, agent axis folded into batch
for all convs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.models.backbone import fold_agents, unfold_agents
from v2x_sim_tpu.models.det import fusion as F
from v2x_sim_tpu.models.det.v2vnet import V2VNetFusion
from v2x_sim_tpu.models.det.when2com import When2comFusion

import jax

UNET_CHANNELS = (32, 64, 128, 256)
BOTTLENECK = 512


class DoubleConv(nn.Module):
    features: int
    axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class SegOutput(NamedTuple):
    """logits (B, A, H, W, num_classes)."""

    logits: jnp.ndarray


class SegModel(nn.Module):
    """UNet with collaboration fusion at the bottleneck."""

    config: Config
    mode: str = "lowerbound"
    axis_name: Optional[str] = None
    dtype: Optional[object] = None

    def setup(self):
        self.downs = [
            DoubleConv(ch, axis_name=self.axis_name, dtype=self.dtype, name=f"down{i}")
            for i, ch in enumerate(UNET_CHANNELS)
        ]
        self.bottleneck = DoubleConv(
            BOTTLENECK, axis_name=self.axis_name, dtype=self.dtype, name="bottleneck"
        )
        self.ups = [
            DoubleConv(ch, axis_name=self.axis_name, dtype=self.dtype, name=f"up{i}")
            for i, ch in enumerate(reversed(UNET_CHANNELS))
        ]
        self.head = nn.Conv(
            self.config.num_seg_classes, (1, 1), dtype=self.dtype, name="head"
        )
        grid = self.config.grid
        if self.mode == "cat":
            self.fusion = F.CatFusion(grid, dtype=self.dtype)
        elif self.mode == "agent":
            self.fusion = F.AgentWiseWeightedFusion(grid, dtype=self.dtype)
        elif self.mode == "disco":
            self.fusion = F.DiscoFusion(grid, dtype=self.dtype)
        elif self.mode == "when2com":
            self.fusion = When2comFusion(grid, argmax_mode=False, dtype=self.dtype)
        elif self.mode == "who2com":
            self.fusion = When2comFusion(grid, argmax_mode=True, dtype=self.dtype)
        elif self.mode == "v2v":
            self.fusion = V2VNetFusion(grid, dtype=self.dtype)
        else:
            self.fusion = None

    def _fuse(self, feat, trans, mask, train):
        grid = self.config.grid
        if self.mode == "sum":
            return F.fuse_sum(feat, trans, mask, grid)
        if self.mode == "mean":
            return F.fuse_mean(feat, trans, mask, grid)
        if self.mode == "max":
            return F.fuse_max(feat, trans, mask, grid)
        return self.fusion(feat, trans, mask, train)

    def __call__(self, occupancy, trans, agent_mask, train: bool = True):
        a = occupancy.shape[1]
        x = fold_agents(occupancy)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        skips = []
        for down in self.downs:
            x = down(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = self.bottleneck(x, train)

        if self.mode not in ("lowerbound", "upperbound"):
            f = unfold_agents(x, a)
            x = fold_agents(self._fuse(f, trans, agent_mask, train))

        for up, skip in zip(self.ups, reversed(skips)):
            h, w = skip.shape[-3], skip.shape[-2]
            x = jax.image.resize(
                x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear"
            )
            x = jnp.concatenate([x, skip], axis=-1)
            x = up(x, train)
        return SegOutput(unfold_agents(self.head(x).astype(jnp.float32), a))
