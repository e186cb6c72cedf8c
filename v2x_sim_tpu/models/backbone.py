"""MotionNet-style STPN backbone and detection heads (flax, NHWC).

TPU-native rebuild of the reference's spatio-temporal pyramid backbone
(† coperception/models/det/backbone/Backbone.py, SURVEY.md §2.1): a 2D
conv encoder 32->64->128->256->512 with stride-2 stages, and a decoder
with skip connections back to full BEV resolution, plus classification
and regression heads.

TPU-first choices:
  * NHWC layout throughout (XLA:TPU's native conv layout; channels on the
    128-lane axis).
  * The agent axis is pre-folded into the batch dimension by the caller
    (`fold_agents`), so every conv sees one large batch for the MXU.
  * Encoder exposes all pyramid levels so collaboration models can fuse
    at any stage k in {0..4} (reference `--layer`).
  * BatchNorm carries `batch_stats` collection; pass `axis_name` for
    cross-device stat sync under `shard_map` data parallelism.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import jax

#: Encoder channel plan per stage (stage 0 is stride-1 stem).
STAGE_CHANNELS: Tuple[int, ...] = (32, 64, 128, 256, 512)

#: Activation dtype (params stay float32). bfloat16 keeps the convs on
#: the MXU's fast path; heads cast back to float32 for the losses.
Dtype = Any


class _SplitConv(nn.Module):
    """3x3 conv over a LOGICAL concatenation of two operands, applied as
    two convs with sliced halves of one (3, 3, Ca+Cb, Cout) kernel.

    Same math and the same param tree as conv(concat(a, b)), without
    materializing the concatenated map: at decoder geometry the
    concat+pad+relayout of the 192-channel full-res map cost ~3.9 ms of
    pure HBM traffic per batch (docs/PERF.md). `phases=4` applies the
    s2d kernel transform per half, which also replaces the concat_perm
    input permutation (each half's blocked layout matches its own
    transformed kernel directly)."""

    features: int
    phases: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        from v2x_sim_tpu.models.s2d import s2d_conv, s2d_kernel

        ca = a.shape[-1] // self.phases
        cb = b.shape[-1] // self.phases
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, ca + cb, self.features),
            jnp.float32,
        )
        dtype = self.dtype or kernel.dtype
        kernel = kernel.astype(dtype)
        ka, kb = kernel[:, :, :ca], kernel[:, :, ca:]
        a = a.astype(dtype)
        b = b.astype(dtype)
        if self.phases == 4:
            return s2d_conv(a, s2d_kernel(ka), True) + s2d_conv(
                b, s2d_kernel(kb), True
            )
        conv = lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return conv(a, ka) + conv(b, kb)


class ConvBlock(nn.Module):
    """Two 3x3 conv + BN + ReLU layers; optional stride-2 on the first.

    Pass `skip` to treat the first conv's input as concat([x, skip])
    without materializing the concatenation (_SplitConv).

    `mode` selects the execution layout (same params, same math —
    models.s2d):
      * "plain": standard NHWC convs.
      * "s2d": input AND output are 2x2-blocked (full-res stages run at
        half resolution with 4x channels for MXU utilization).
      * "s2d_entry": blocked input, plain half-res output (the stride-2
        stage that consumes a blocked predecessor).
    """

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = None
    mode: str = "plain"
    in_perm: Optional[tuple] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
        skip: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from v2x_sim_tpu.models.s2d import S2DBatchNorm, S2DConv

        for i, s in enumerate((self.stride, 1)):
            blocked_in = self.mode == "s2d" or (
                self.mode == "s2d_entry" and i == 0
            )
            blocked_out = self.mode == "s2d" or (
                self.mode == "s2d_entry" and i == 0 and s == 1
            )
            if i == 0 and skip is not None:
                assert s == 1 and self.mode in ("plain", "s2d")
                x = _SplitConv(
                    self.features,
                    phases=4 if blocked_in else 1,
                    dtype=self.dtype,
                    name="Conv_0",
                )(x, skip)
            elif blocked_in:
                x = S2DConv(
                    self.features,
                    stride=s,
                    use_bias=False,
                    in_perm=self.in_perm if i == 0 else None,
                    dtype=self.dtype,
                    name=f"Conv_{i}",
                )(x)
            else:
                # Explicit pad-1 (torch convention) rather than "SAME":
                # identical at stride 1, but one pixel shifted at stride 2
                # — required for reference-checkpoint parity (SURVEY.md §7).
                x = nn.Conv(
                    self.features,
                    (3, 3),
                    strides=(s, s),
                    padding=((1, 1), (1, 1)),
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"Conv_{i}",
                )(x)
            if blocked_out:
                x = S2DBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    axis_name=self.axis_name if train else None,
                    dtype=self.dtype,
                    name=f"BatchNorm_{i}",
                )(x)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    axis_name=self.axis_name if train else None,
                    dtype=self.dtype,
                    name=f"BatchNorm_{i}",
                )(x)
            x = nn.relu(x)
        return x


class STPNEncoder(nn.Module):
    """Pyramid encoder: returns all 5 stage outputs (highest res first).

    With `s2d=True` (models.s2d) stage 0 runs 2x2-blocked and `feats[0]`
    is returned BLOCKED — (H/2, W/2, 4*32) — consumed by the matching
    decoder/heads. Stages 1..4 are bitwise the plain path.
    """

    axis_name: Optional[str] = None
    dtype: Dtype = None
    s2d: bool = False
    #: Per-stage channel widths. Default is the reference STPN geometry;
    #: smaller tuples (e.g. width_mult'ed via DetModel) give CI-speed
    #: models with identical structure.
    stage_channels: Tuple[int, ...] = STAGE_CHANNELS

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, pre_blocked: bool = False
    ) -> Sequence[jnp.ndarray]:
        """`pre_blocked`: the input already has s2d layout (H/2, W/2, 4D)
        — produced by ops.voxelize.voxelize_blocked, skipping the ~1.8 ms
        full-res relayout of the occupancy (docs/PERF.md)."""
        from v2x_sim_tpu.models.s2d import space_to_depth

        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.s2d and not pre_blocked:
            x = space_to_depth(x)
        feats = []
        for i, ch in enumerate(self.stage_channels):
            if self.s2d and i == 0:
                mode = "s2d"
            elif self.s2d and i == 1:
                mode = "s2d_entry"
            else:
                mode = "plain"
            x = ConvBlock(
                ch,
                stride=1 if i == 0 else 2,
                axis_name=self.axis_name,
                dtype=self.dtype,
                mode=mode,
            )(x, train)
            feats.append(x)
        return feats


class STPNDecoder(nn.Module):
    """Decoder with skip connections back to stage-0 resolution.

    With `s2d=True` the last `s2d_stages` (low-channel, high-res) stages
    run 2x2-blocked: the 2x bilinear upsample lands directly in blocked
    layout and the final output is (H/2, W/2, 4*32) — same values as the
    plain path, different layout. `s2d_stages=2` additionally blocks the
    second-to-last stage; measured SLOWER in-model on v5e (the
    space_to_depth/depth_to_space relayouts around it outweigh the conv
    speedup: 58.2 -> 62.9 ms/B16 forward), so the default stays 1.
    """

    axis_name: Optional[str] = None
    dtype: Dtype = None
    s2d: bool = False
    #: trailing decoder stages executed blocked when s2d is on (1 or 2).
    s2d_stages: int = 1

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jnp.ndarray],
        train: bool,
        num_stages: Optional[int] = None,
    ) -> jnp.ndarray:
        """`num_stages` truncates the loop (profiling only — see
        tools/profile_det)."""
        from v2x_sim_tpu.models.s2d import (
            concat_perm,
            depth_to_space,
            s2d_upsample2x,
            space_to_depth,
        )

        x = feats[-1]
        n_stages = len(feats) - 1
        for idx, skip in enumerate(reversed(feats[:-1])):
            if num_stages is not None and idx >= num_stages:
                break
            last = idx == n_stages - 1
            second_last = idx == n_stages - 2
            if self.s2d and second_last and self.s2d_stages >= 2:
                # skip is a plain encoder map: block it to match the
                # blocked upsample of x; same math as the plain branch.
                up = s2d_upsample2x(x)
                skip_b = space_to_depth(skip.astype(x.dtype))
                cat = jnp.concatenate([up, skip_b], axis=-1)
                x = ConvBlock(
                    skip.shape[-1],
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    mode="s2d",
                    in_perm=tuple(
                        concat_perm([x.shape[-1], skip.shape[-1]])
                    ),
                )(cat, train)
                # Bridge back to plain layout for the final stage's
                # plain-input upsample (a relayout copy, ~1% of the
                # stage's conv time).
                x = depth_to_space(x)
            elif self.s2d and last:
                # skip is blocked stage-0 output; upsample x straight into
                # blocked layout. The logical concat with the skip runs as
                # a split conv (_SplitConv) — no concatenated map, no
                # concat_perm.
                up = s2d_upsample2x(x)
                x = ConvBlock(
                    skip.shape[-1] // 4,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    mode="s2d",
                )(up, train, skip=skip.astype(x.dtype))
            else:
                h, w = skip.shape[-3], skip.shape[-2]
                x = jax.image.resize(
                    x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear"
                )
                x = ConvBlock(
                    skip.shape[-1], axis_name=self.axis_name, dtype=self.dtype
                )(x, train, skip=skip.astype(x.dtype))
        return x  # (..., H, W, 32) or blocked (..., H/2, W/2, 128)


class ClassificationHead(nn.Module):
    """Per-cell per-anchor class logits (reference `ClassificationHead`)."""

    num_anchors: int
    num_classes: int
    dtype: Dtype = None
    s2d: bool = False
    blocked_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _head_convs(
            x,
            32,
            self.num_anchors * self.num_classes,
            self.dtype,
            self.s2d,
            self.blocked_out,
        )
        k = self.num_anchors * (4 if (self.s2d and self.blocked_out) else 1)
        # Stay in compute dtype: a float32 cast here writes an extra
        # ~600 MB of full-res logits per production batch. Consumers
        # (losses, decode) cast the small slices they need.
        return x.reshape(x.shape[:-1] + (k, self.num_classes))


class RegressionHead(nn.Module):
    """Per-anchor 6-dim box deltas (reference `SingleRegressionHead`).

    `lazy=True` (predict path) stops after the hidden 3x3 conv + ReLU and
    returns the blocked hidden map; the final 1x1 conv is then applied by
    ops.postprocess.decode_topk_blocked_lazy at the top-K cells only —
    the full-resolution reg map (453 MB/production batch) plus its decode
    relayout copies (~2.8 ms) never materialize. Requires s2d +
    blocked_out."""

    num_anchors: int
    box_code_size: int = 6
    dtype: Dtype = None
    s2d: bool = False
    blocked_out: bool = False
    lazy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.lazy:
            from v2x_sim_tpu.models.s2d import S2DConv

            assert self.s2d and self.blocked_out
            x = S2DConv(32, dtype=self.dtype, name="Conv_0")(x)
            return nn.relu(x)  # blocked hidden (..., H/2, W/2, 4*32)
        x = _head_convs(
            x,
            32,
            self.num_anchors * self.box_code_size,
            self.dtype,
            self.s2d,
            self.blocked_out,
        )
        k = self.num_anchors * (4 if (self.s2d and self.blocked_out) else 1)
        # No float32 cast — see ClassificationHead.
        return x.reshape(x.shape[:-1] + (k, self.box_code_size))


def _head_convs(x, hidden: int, out: int, dtype, s2d: bool, blocked_out: bool):
    """Shared head body: 3x3 conv + ReLU + 1x1 conv, plain or blocked.

    In blocked mode the result converts back to plain full-res layout at
    the end UNLESS blocked_out is set — the training path keeps heads
    blocked (and blocks the targets to match) so no transpose sits on the
    gradient path."""
    if s2d:
        from v2x_sim_tpu.models.s2d import S2DConv, S2DConv1x1, depth_to_space

        x = S2DConv(hidden, dtype=dtype, name="Conv_0")(x)
        x = nn.relu(x)
        x = S2DConv1x1(out, dtype=dtype, name="Conv_1")(x)
        return x if blocked_out else depth_to_space(x)
    x = nn.Conv(hidden, (3, 3), dtype=dtype, name="Conv_0")(x)
    x = nn.relu(x)
    return nn.Conv(out, (1, 1), dtype=dtype, name="Conv_1")(x)


def fold_agents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, A, H, W, C) -> (B*A, H, W, C): the reference's `agents_to_batch`
    († coperception/models/det/base/DetModelBase.py) as a zero-cost reshape."""
    b, a = x.shape[0], x.shape[1]
    return x.reshape((b * a,) + x.shape[2:])


def unfold_agents(x: jnp.ndarray, num_agents: int) -> jnp.ndarray:
    """(B*A, H, W, C) -> (B, A, H, W, C)."""
    ba = x.shape[0]
    return x.reshape((ba // num_agents, num_agents) + x.shape[1:])
