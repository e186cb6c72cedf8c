"""Space-to-depth execution of low-channel full-resolution conv stages.

The STPN backbone's full-res stages (256x256 BEV at 13..32 channels) and
the detection heads waste the MXU: a 3x3 conv with 32 in/out channels
uses ~6% of the 128x128 systolic array. Executing those stages on a
2x2-blocked layout — (H, W, C) -> (H/2, W/2, 4C) — quadruples the
channel dims to 52..128 and runs the SAME math at ~4x the speed.

This is an execution-layout change, not an architecture change: the
parameter tree is IDENTICAL to the plain NHWC modules (same names, same
(3, 3, Cin, Cout) kernels), and every transform below is exact:

  * 3x3 stride-1 conv  -> 3x3 conv on blocks with a (3,3,4Cin,4Cout)
    kernel whose entries are a fixed scatter of the original 9*Cin*Cout
    weights (1/4 density; zero-padding semantics preserved).
  * 3x3 stride-2 conv  -> 2x2 block conv, blocked input, normal output.
  * 2x bilinear resize -> fixed depthwise 3x3 block conv (edge-clamped
    via explicit edge padding, matching jax.image.resize).
  * BatchNorm          -> stats reduced over the 4 phase groups as well,
    which reconstructs the full-res per-channel statistics exactly
    (mean/E[x^2] are averages of the phase means).

tests/test_s2d.py asserts forward equivalence against the plain modules
in f32. Used by models.backbone when `s2d=True` (the default on the det
path); the reference has no analog — its CUDA convs don't pay this
penalty († coperception/models/det/backbone/Backbone.py runs plain NCHW).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C); phase-major channel layout:
    out channel (2*pr + pc)*C + c holds x[2i+pr, 2j+pc, c]."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, (-4, -2), (-3, -2))  # (..., h/2, w/2, 2, 2, c)
    return x.reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *lead, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*lead, h, w, 2, 2, c)
    x = jnp.moveaxis(x, (-3, -2), (-4, -2))  # (..., h, 2, w, 2, c)
    return x.reshape(*lead, h * 2, w * 2, c)


def _phase_split(q: int) -> Tuple[int, int]:
    """Row/col index q = 2*block + phase with q possibly negative."""
    return q // 2, q % 2


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Transform a (3, 3, Cin, Cout) stride-1 kernel to the blocked
    (3, 3, 4Cin, 4Cout) equivalent (zero-filled elsewhere)."""
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for pr in range(2):
        for pc in range(2):
            po = 2 * pr + pc
            for di in (-1, 0, 1):
                br, pir = _phase_split(pr + di)
                for dj in (-1, 0, 1):
                    bc, pic = _phase_split(pc + dj)
                    pi = 2 * pir + pic
                    out = out.at[
                        br + 1,
                        bc + 1,
                        pi * cin : (pi + 1) * cin,
                        po * cout : (po + 1) * cout,
                    ].set(w[di + 1, dj + 1])
    return out


def s2d_stride2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Transform a (3, 3, Cin, Cout) stride-2 kernel to a (2, 2, 4Cin,
    Cout) kernel over blocked input producing plain half-res output."""
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for di in (-1, 0, 1):
        br, pir = _phase_split(di)  # block offset in {-1, 0}
        for dj in (-1, 0, 1):
            bc, pic = _phase_split(dj)
            pi = 2 * pir + pic
            out = out.at[
                br + 1, bc + 1, pi * cin : (pi + 1) * cin, :
            ].set(w[di + 1, dj + 1])
    return out


def permute_input_channels(w: jnp.ndarray, perm: Sequence[int]) -> jnp.ndarray:
    """Reorder a blocked kernel's input-channel axis (for concatenated
    s2d inputs whose layout is [all phases of A | all phases of B] rather
    than the canonical phase-major [phase0 of A+B | ...])."""
    return w[:, :, jnp.asarray(perm), :]


def concat_perm(channels: Sequence[int]) -> list:
    """Kernel input-row permutation for a [s2d(A) | s2d(B) | ...]
    concatenated input: perm[actual_channel] = canonical phase-major
    channel, so `kernel[:, :, perm, :]` pairs each actual input lane with
    the right canonical weight row.

    Actual lane (part, phase, c) sits at offset(part) + phase*C_part + c;
    its canonical index is phase*C_total + offset_c(part) + c.
    """
    total = sum(channels)
    perm = []
    offset_c = 0
    for c_part in channels:
        for phase in range(4):
            for c in range(c_part):
                perm.append(phase * total + offset_c + c)
        offset_c += c_part
    assert len(perm) == 4 * total
    return perm


def s2d_conv(x: jnp.ndarray, kernel: jnp.ndarray, stride1: bool) -> jnp.ndarray:
    """Apply a transformed blocked kernel with torch zero-pad semantics."""
    if stride1:
        pad = ((1, 1), (1, 1))
    else:
        pad = ((1, 0), (1, 0))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_upsample2x_kernel(c: int, dtype) -> jnp.ndarray:
    """Fixed (3, 3, C, 4C)-HWIO kernel computing 2x bilinear upsampling
    (half-pixel centers) of a plain (h, w, C) map directly into s2d
    layout of the (2h, 2w, C) result. Input must be EDGE-padded by 1.

    A dense kernel with 1/C useful entries looks wasteful, but on v5e the
    MXU conv beats an elementwise shift/blend construction of the same
    values in-model (210 -> 158 scenes/sec headline when swapped): the
    conv consumes the padded input in one fused pass, while the shifted
    slices + 4-way concat materialize extra full-res copies."""
    # Row taps per output phase: phase0 = 0.25*in[i-1] + 0.75*in[i],
    # phase1 = 0.75*in[i] + 0.25*in[i+1].
    taps = {0: {-1: 0.25, 0: 0.75}, 1: {0: 0.75, 1: 0.25}}
    w = jnp.zeros((3, 3, c, 4 * c), dtype)
    eye = jnp.eye(c, dtype=dtype)
    for pr in range(2):
        for pc in range(2):
            po = 2 * pr + pc
            for dr, wr in taps[pr].items():
                for dc, wc in taps[pc].items():
                    w = w.at[
                        dr + 1, dc + 1, :, po * c : (po + 1) * c
                    ].add(eye * (wr * wc))
    return w


def s2d_upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample of (..., h, w, C) returned in s2d layout
    (..., h, w, 4C); exact match of jax.image.resize(method='bilinear')."""
    c = x.shape[-1]
    kernel = s2d_upsample2x_kernel(c, x.dtype)
    xp = jnp.pad(
        x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)], mode="edge"
    )
    return jax.lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class S2DConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3))`` on blocked input.

    Owns an identical param tree (kernel (3, 3, Cin, Cout) [+ bias]) and
    applies the s2d-transformed kernel. `stride` 2 consumes blocked input
    and emits plain output; `in_perm` adapts concatenated inputs.
    """

    features: int
    stride: int = 1
    use_bias: bool = True
    in_perm: Optional[tuple] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1] // 4  # input is always blocked
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_features, self.features),
            jnp.float32,
        )
        dtype = self.dtype or kernel.dtype
        kernel = kernel.astype(dtype)
        if self.stride == 1:
            k2 = s2d_kernel(kernel)
        else:
            k2 = s2d_stride2_kernel(kernel)
        if self.in_perm is not None:
            k2 = permute_input_channels(k2, list(self.in_perm))
        y = s2d_conv(x.astype(dtype), k2, stride1=self.stride == 1)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(dtype)
            reps = 4 if self.stride == 1 else 1
            y = y + jnp.tile(bias, reps)
        return y


class S2DConv1x1(nn.Module):
    """Drop-in for ``nn.Conv(features, (1, 1))`` on blocked input: one
    shared (Cin, Cout) matmul applied per phase group (param tree
    identical to the plain 1x1 conv)."""

    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        dtype = self.dtype or kernel.dtype
        w = kernel[0, 0].astype(dtype)
        y = x.reshape(x.shape[:-1] + (4, cin)) @ w + bias.astype(dtype)
        return y.reshape(x.shape[:-1] + (4 * self.features,))


class S2DBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` on blocked (..., 4C) input.

    Param/stat tree identical to nn.BatchNorm over C channels; batch
    statistics additionally reduce over the 4 phase groups, which equals
    the plain full-resolution per-channel statistics exactly.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32).reshape(-1, 4, c)
            mean = jnp.mean(xf, axis=(0, 1))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        dtype = self.dtype or x.dtype
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(dtype)
        shift = (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(
            dtype
        )
        return x * jnp.tile(inv, 4) + jnp.tile(shift, 4)
