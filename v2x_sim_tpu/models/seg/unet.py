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

With `s2d=True` (default) the full-resolution stages run 2x2-blocked
exactly like the detection backbone (models.s2d — same params, same
math, equivalence-tested): stage 0 consumes blocked occupancy, its 2x2
max-pool becomes a free max over the 4 phase channel groups (no spatial
op at all), the final up stage runs blocked with a split-concat conv,
and the 1x1 head applies per phase group.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.models.backbone import ConvBlock, fold_agents, unfold_agents
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

    #: blocked execution of the full-res stages (models.s2d); exact.
    s2d: bool = True
    #: Uniform channel scale on UNET_CHANNELS/BOTTLENECK (1.0 = reference
    #: 32..256/512). Sub-1.0 keeps the exact architecture at CI cost —
    #: same knob as DetModel.width_mult.
    width_mult: float = 1.0
    #: Number of down/up stages (reference = 4; bottleneck sits at
    #: H/2^depth). CI-sized grids need a shallower net so the bottleneck
    #: — where collaboration fusion happens — retains spatial resolution
    #: (at 32x32 BEV the reference depth leaves a 2x2 bottleneck: nothing
    #: to fuse).
    depth: int = 4
    #: GSPMD BEV spatial sharding (same contract as DetModel.spatial_mesh):
    #: pins the row axis of the stage maps to the mesh's spatial axis.
    spatial_mesh: Optional[object] = None

    def setup(self):
        assert 1 <= self.depth <= len(UNET_CHANNELS), (
            f"depth must be in [1, {len(UNET_CHANNELS)}], got {self.depth}"
        )
        w = lambda c: max(8, int(round(c * self.width_mult)))
        chans = UNET_CHANNELS[: self.depth]
        self.downs = [
            (
                ConvBlock(
                    w(ch),
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    mode="s2d",
                    name=f"down{i}",
                )
                if self.s2d and i == 0
                else DoubleConv(
                    w(ch), axis_name=self.axis_name, dtype=self.dtype,
                    name=f"down{i}",
                )
            )
            for i, ch in enumerate(chans)
        ]
        self.bottleneck = DoubleConv(
            w(2 * chans[-1]), axis_name=self.axis_name, dtype=self.dtype,
            name="bottleneck",
        )
        n_up = len(chans)
        self.ups = [
            (
                ConvBlock(
                    w(ch),
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    mode="s2d",
                    name=f"up{i}",
                )
                if self.s2d and i == n_up - 1
                else DoubleConv(
                    w(ch), axis_name=self.axis_name, dtype=self.dtype,
                    name=f"up{i}",
                )
            )
            for i, ch in enumerate(reversed(chans))
        ]
        if self.s2d:
            from v2x_sim_tpu.models.s2d import S2DConv1x1

            # Identical param tree to the plain 1x1 conv head.
            self.head = S2DConv1x1(
                self.config.num_seg_classes, dtype=self.dtype, name="head"
            )
        else:
            self.head = nn.Conv(
                self.config.num_seg_classes, (1, 1), dtype=self.dtype,
                name="head",
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

    def _pin_rows(self, t):
        """Constrain the row axis to the spatial mesh axis (no-op without
        spatial_mesh); see models.det.net.DetModel._pin_rows."""
        if self.spatial_mesh is None:
            return t
        from jax.sharding import NamedSharding, PartitionSpec

        from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS

        return jax.lax.with_sharding_constraint(
            t,
            NamedSharding(self.spatial_mesh, PartitionSpec(None, SPATIAL_AXIS)),
        )

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
        from v2x_sim_tpu.models.s2d import (
            depth_to_space,
            s2d_upsample2x,
            space_to_depth,
        )

        a = occupancy.shape[1]
        d = self.config.grid.grid_shape[2]
        # Occupancy may arrive pre-blocked (ops.voxelize.voxelize_blocked).
        pre_blocked = occupancy.shape[-1] == 4 * d
        assert not pre_blocked or self.s2d
        x = fold_agents(occupancy)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.s2d and not pre_blocked:
            x = space_to_depth(x)
        elif not self.s2d and pre_blocked:
            raise ValueError("blocked occupancy requires s2d")
        x = self._pin_rows(x)
        skips = []
        for i, down in enumerate(self.downs):
            x = self._pin_rows(down(x, train))
            skips.append(x)
            if self.s2d and i == 0:
                # 2x2 max pool of a blocked map = max over the 4 phase
                # channel groups — no spatial op (models.s2d layout).
                c = x.shape[-1] // 4
                x = jnp.max(
                    x.reshape(x.shape[:-1] + (4, c)), axis=-2
                )
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = self.bottleneck(x, train)

        if self.mode not in ("lowerbound", "upperbound"):
            f = unfold_agents(x, a)
            x = fold_agents(self._fuse(f, trans, agent_mask, train))

        n_up = len(self.ups)
        for i, (up, skip) in enumerate(zip(self.ups, reversed(skips))):
            last = i == n_up - 1
            if self.s2d and last:
                # skip is the blocked down0 output; upsample straight
                # into blocked layout, split-concat conv (no concat
                # materialization, no perm — models.backbone._SplitConv).
                x = s2d_upsample2x(x)
                x = up(x, train, skip=skip)
            else:
                h, w = skip.shape[-3], skip.shape[-2]
                x = jax.image.resize(
                    x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear"
                )
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._pin_rows(up(x, train))
        if self.s2d:
            # 1x1 head per phase group, then un-block the small logits.
            logits = depth_to_space(self.head(x))
        else:
            logits = self.head(x)
        return SegOutput(unfold_agents(logits.astype(jnp.float32), a))
