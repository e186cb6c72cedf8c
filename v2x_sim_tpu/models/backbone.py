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


class ConvBlock(nn.Module):
    """Two 3x3 conv + BN + ReLU layers; optional stride-2 on the first."""

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i, s in enumerate((self.stride, 1)):
            # Explicit pad-1 (torch convention) rather than "SAME":
            # identical at stride 1, but one pixel shifted at stride 2 —
            # required for reference-checkpoint parity (SURVEY.md §7).
            x = nn.Conv(
                self.features,
                (3, 3),
                strides=(s, s),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class STPNEncoder(nn.Module):
    """Pyramid encoder: returns all 5 stage outputs (highest res first)."""

    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> Sequence[jnp.ndarray]:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = []
        for i, ch in enumerate(STAGE_CHANNELS):
            x = ConvBlock(
                ch,
                stride=1 if i == 0 else 2,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )(x, train)
            feats.append(x)
        return feats


class STPNDecoder(nn.Module):
    """Decoder with skip connections back to stage-0 resolution."""

    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool) -> jnp.ndarray:
        x = feats[-1]
        for skip in reversed(feats[:-1]):
            h, w = skip.shape[-3], skip.shape[-2]
            x = jax.image.resize(
                x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear"
            )
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBlock(
                skip.shape[-1], axis_name=self.axis_name, dtype=self.dtype
            )(x, train)
        return x  # (..., H, W, 32)


class ClassificationHead(nn.Module):
    """Per-cell per-anchor class logits (reference `ClassificationHead`)."""

    num_anchors: int
    num_classes: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(32, (3, 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_classes, (1, 1), dtype=self.dtype)(x)
        # Stay in compute dtype: a float32 cast here writes an extra
        # ~600 MB of full-res logits per production batch. Consumers
        # (losses, decode) cast the small slices they need.
        return x.reshape(x.shape[:-1] + (self.num_anchors, self.num_classes))


class RegressionHead(nn.Module):
    """Per-anchor 6-dim box deltas (reference `SingleRegressionHead`)."""

    num_anchors: int
    box_code_size: int = 6
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(32, (3, 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_anchors * self.box_code_size, (1, 1), dtype=self.dtype
        )(x)
        # No float32 cast — see ClassificationHead.
        return x.reshape(x.shape[:-1] + (self.num_anchors, self.box_code_size))


def fold_agents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, A, H, W, C) -> (B*A, H, W, C): the reference's `agents_to_batch`
    († coperception/models/det/base/DetModelBase.py) as a zero-cost reshape."""
    b, a = x.shape[0], x.shape[1]
    return x.reshape((b * a,) + x.shape[2:])


def unfold_agents(x: jnp.ndarray, num_agents: int) -> jnp.ndarray:
    """(B*A, H, W, C) -> (B, A, H, W, C)."""
    ba = x.shape[0]
    return x.reshape((ba // num_agents, num_agents) + x.shape[1:])
