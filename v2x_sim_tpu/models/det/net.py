"""Unified collaborative detection model.

One flax module covers the reference's whole det model zoo (SURVEY.md
§2.1: FaFNet, TeacherNet, When2com, V2VNet, DiscoNet, *Fusion — all of
† coperception/models/det/) by composing the shared STPN backbone + heads
with a fusion strategy selected by a *static* config string. This mirrors
how the reference factors `DetModelBase` + per-strategy subclasses, but
as data (config) instead of a class hierarchy — every variant compiles to
the same jitted train/eval step shape.

Input contract (the reference's L4 contract, SURVEY.md §1):
  occupancy (B, A, H, W, D)   — per-agent BEV voxel occupancy, D z-slices
                                 as channels;
  trans     (B, A, A, 4, 4)   — pairwise agent pose transforms,
                                 trans[b, i, j] = T_{i<-j};
  agent_mask(B, A)            — real-agent mask (the reference's
                                 `num_agent_tensor` as a mask).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.models.backbone import (
    STAGE_CHANNELS,
    ClassificationHead,
    RegressionHead,
    STPNDecoder,
    STPNEncoder,
    fold_agents,
    unfold_agents,
)
from v2x_sim_tpu.models.det import fusion as F
from v2x_sim_tpu.models.det.v2vnet import V2VNetFusion
from v2x_sim_tpu.models.det.when2com import When2comFusion

#: All supported collaboration modes (superset of the reference's --com).
MODES = (
    "lowerbound",
    "upperbound",
    "sum",
    "mean",
    "max",
    "cat",
    "agent",
    "when2com",
    "who2com",
    "v2v",
    "disco",
)


class DetOutput(NamedTuple):
    """cls_logits (B, A, H, W, K, C); reg (B, A, H, W, K, 6);
    fused_feat — the post-fusion feature map (KD student features, or None
    when kd is disabled)."""

    cls_logits: jnp.ndarray
    reg: jnp.ndarray
    fused_feat: Optional[jnp.ndarray]


class DetModel(nn.Module):
    """Backbone + (optional) fusion + heads for any collaboration mode."""

    config: Config
    mode: str = "lowerbound"
    fusion_layer: Optional[int] = None  # default: config.fusion_layer
    kd: bool = False
    #: when2com/who2com only — warp requested neighbor features into the
    #: ego frame before mixing (reference --warp_flag ablation).
    warp_flag: bool = True
    #: v2v only — GNN message-passing rounds (reference default 3;
    #: diagnostic knob for the production-geometry convergence study).
    v2v_rounds: int = 3
    #: v2v only — GroupNorm the aggregated message (off = reference
    #: parity; see docs/V2V_DIAGNOSIS.md).
    v2v_msg_norm: bool = False
    #: Uniform channel scale on the STPN stages (1.0 = reference 32..512).
    #: Sub-1.0 models keep the exact architecture at CI-training cost —
    #: used by the collaboration-benefit tests.
    width_mult: float = 1.0
    axis_name: Optional[str] = None
    dtype: Optional[object] = None  # activation dtype (e.g. bfloat16)
    s2d: bool = True  # blocked execution of full-res stages (models.s2d)
    #: Keep head outputs in blocked layout — (B, A, H/2, W/2, 4K, C) with
    #: anchor index p*K + k for 2x2 phase p. The training path uses this
    #: (targets are blocked to match; see train.det_module) so no
    #: transpose sits on the gradient path. Requires s2d active.
    blocked_heads: bool = False
    #: predict-path optimization: the regression head stops at its hidden
    #: map; the final 1x1 conv runs at top-K cells inside the decode
    #: (models.backbone.RegressionHead lazy mode). Output `reg` is then
    #: the blocked hidden map, NOT box deltas.
    lazy_reg: bool = False
    #: GSPMD BEV spatial sharding: a jax.sharding.Mesh with a
    #: parallel.mesh.SPATIAL_AXIS axis. When set, sharding constraints
    #: pin the BEV row axis of the input, every pyramid level, and the
    #: decoded map to that axis; XLA's SPMD partitioner then executes the
    #: convs row-sharded with automatic halo exchange (the manual-control
    #: analog lives in parallel.spatial). Values are identical to the
    #: unsharded model (tests/test_spatial.py).
    spatial_mesh: Optional[object] = None

    def setup(self):
        assert self.mode in MODES, f"unknown mode {self.mode}"
        # Fusion at layer 0 would warp a blocked map — fall back to plain.
        use_s2d = self.s2d and (
            self.mode in ("lowerbound", "upperbound") or self._layer >= 1
        )
        self._use_s2d = use_s2d
        blocked = use_s2d and self.blocked_heads
        chans = tuple(
            max(8, int(round(c * self.width_mult))) for c in STAGE_CHANNELS
        )
        self.encoder = STPNEncoder(
            axis_name=self.axis_name, dtype=self.dtype, s2d=use_s2d,
            stage_channels=chans,
        )
        self.decoder = STPNDecoder(
            axis_name=self.axis_name, dtype=self.dtype, s2d=use_s2d
        )
        self.cls_head = ClassificationHead(
            self.config.anchors.num_anchors, self.config.num_classes,
            dtype=self.dtype, s2d=use_s2d, blocked_out=blocked,
        )
        self.reg_head = RegressionHead(
            self.config.anchors.num_anchors, self.config.anchors.box_code_size,
            dtype=self.dtype, s2d=use_s2d, blocked_out=blocked,
            lazy=self.lazy_reg,
        )
        grid = self.config.grid
        if self.mode == "cat":
            self.fusion = F.CatFusion(grid, dtype=self.dtype)
        elif self.mode == "agent":
            self.fusion = F.AgentWiseWeightedFusion(grid, dtype=self.dtype)
        elif self.mode == "disco":
            self.fusion = F.DiscoFusion(grid, dtype=self.dtype)
        elif self.mode == "when2com":
            self.fusion = When2comFusion(
                grid, argmax_mode=False, warp_flag=self.warp_flag,
                dtype=self.dtype,
            )
        elif self.mode == "who2com":
            self.fusion = When2comFusion(
                grid, argmax_mode=True, warp_flag=self.warp_flag,
                dtype=self.dtype,
            )
        elif self.mode == "v2v":
            self.fusion = V2VNetFusion(
                grid, rounds=self.v2v_rounds, msg_norm=self.v2v_msg_norm,
                dtype=self.dtype,
            )
        else:
            self.fusion = None

    @property
    def _layer(self) -> int:
        return (
            self.config.fusion_layer
            if self.fusion_layer is None
            else self.fusion_layer
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

    def _pin_rows(self, t: jnp.ndarray) -> jnp.ndarray:
        """Constrain a folded (B*A, h, w, C) map's row axis to the
        spatial mesh axis (no-op without `spatial_mesh`). Between pins,
        XLA's SPMD partitioner keeps the convs row-sharded and inserts
        the halo exchanges itself; the warp inside fusion all-gathers the
        (small, fusion-layer) map it needs."""
        if self.spatial_mesh is None:
            return t
        from jax.sharding import NamedSharding, PartitionSpec

        from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS

        return jax.lax.with_sharding_constraint(
            t,
            NamedSharding(self.spatial_mesh, PartitionSpec(None, SPATIAL_AXIS)),
        )

    def __call__(
        self,
        occupancy: jnp.ndarray,
        trans: jnp.ndarray,
        agent_mask: jnp.ndarray,
        train: bool = True,
    ) -> DetOutput:
        b, a = occupancy.shape[0], occupancy.shape[1]
        # Occupancy may arrive pre-blocked in s2d layout (4*D channels,
        # ops.voxelize.voxelize_blocked) — inferred from the channel
        # count, so cached plain-layout datasets keep working.
        pre_blocked = occupancy.shape[-1] == 4 * self.config.grid.grid_shape[2]
        assert not pre_blocked or self._use_s2d, (
            "blocked occupancy requires the s2d execution path"
        )
        x = self._pin_rows(fold_agents(occupancy))
        feats = [
            self._pin_rows(f)
            for f in self.encoder(x, train, pre_blocked=pre_blocked)
        ]

        if self.mode not in ("lowerbound", "upperbound"):
            k = self._layer
            f = unfold_agents(feats[k], a)
            fused = self._fuse(f, trans, agent_mask, train)
            feats[k] = self._pin_rows(fold_agents(fused))

        decoded = self._pin_rows(self.decoder(feats, train))
        cls = unfold_agents(self.cls_head(decoded), a)
        reg = unfold_agents(self.reg_head(decoded), a)
        fused_feat = None
        if self.kd:
            ff = feats[self._layer]
            if self._layer == 0 and self._use_s2d:
                # lowerbound/upperbound students keep stage 0 blocked even
                # at fusion_layer 0; the KD contract (TeacherModel) is
                # plain layout there — un-block so the MSE shapes match.
                from v2x_sim_tpu.models.s2d import depth_to_space

                ff = depth_to_space(ff)
            fused_feat = unfold_agents(ff, a)
        return DetOutput(cls, reg, fused_feat)


class TeacherModel(nn.Module):
    """Early-fusion teacher for DiscoNet KD
    († coperception/models/det/TeacherNet.py): runs the backbone on
    merged-cloud occupancy and exposes the intermediate feature map at the
    fusion layer as the distillation target.

    Submodule names deliberately match DetModel's (encoder / decoder /
    cls_head / reg_head): the reference's TeacherNet IS the early-fusion
    upperbound architecture, trained as the upperbound config and loaded
    frozen for `--kd_flag 1` — so here an upperbound-trained DetModel
    TrainState loads verbatim as the frozen teacher variables
    ({"params": state.params, "batch_stats": state.batch_stats})."""

    config: Config
    fusion_layer: Optional[int] = None
    axis_name: Optional[str] = None
    dtype: Optional[object] = None
    s2d: bool = True
    width_mult: float = 1.0  # must match the student's (see DetModel)

    def setup(self):
        # KD feature at layer 0 stays plain layout (DetModel contract).
        self._use_s2d = self.s2d and self._layer >= 1
        chans = tuple(
            max(8, int(round(c * self.width_mult))) for c in STAGE_CHANNELS
        )
        self.encoder = STPNEncoder(
            axis_name=self.axis_name, dtype=self.dtype, s2d=self._use_s2d,
            stage_channels=chans,
        )
        self.decoder = STPNDecoder(
            axis_name=self.axis_name, dtype=self.dtype, s2d=self._use_s2d
        )
        self.cls_head = ClassificationHead(
            self.config.anchors.num_anchors, self.config.num_classes,
            dtype=self.dtype, s2d=self._use_s2d,
        )
        self.reg_head = RegressionHead(
            self.config.anchors.num_anchors, self.config.anchors.box_code_size,
            dtype=self.dtype, s2d=self._use_s2d,
        )

    @property
    def _layer(self) -> int:
        return (
            self.config.fusion_layer
            if self.fusion_layer is None
            else self.fusion_layer
        )

    def __call__(
        self, occupancy: jnp.ndarray, train: bool = False
    ) -> DetOutput:
        a = occupancy.shape[1]
        pre_blocked = occupancy.shape[-1] == 4 * self.config.grid.grid_shape[2]
        assert not pre_blocked or self._use_s2d
        x = fold_agents(occupancy)
        feats = self.encoder(x, train, pre_blocked=pre_blocked)
        decoded = self.decoder(feats, train)
        cls = self.cls_head(decoded)
        reg = self.reg_head(decoded)
        return DetOutput(
            unfold_agents(cls, a),
            unfold_agents(reg, a),
            unfold_agents(feats[self._layer], a),
        )
