"""BEV spatial sharding: halo-exchange convs over the `spatial` mesh axis.

SURVEY.md §5 reserved a `spatial` axis in the mesh (parallel.mesh) for
partitioning the 256x256 BEV plane across chips — the context-parallel
analog for conv backbones. This module turns that reservation into
working code: a 3x3 conv whose input rows are sharded over
`SPATIAL_AXIS`, with the one-row halo fetched from mesh neighbors by
`lax.ppermute` (rides ICI on real hardware), and the stage-0 STPN
ConvBlock (conv-BN-relu x2, † coperception/models/det/backbone/
Backbone.py stem) executed in that sharded form.

Zero-padding semantics: `ppermute` with a non-wrapping permutation
delivers zeros to the edge devices' missing neighbors, which is exactly
the torch pad-1 convention the backbone uses — so the sharded stage is
numerically identical to the unsharded one (tests/test_spatial.py
asserts this on an 8-way CPU mesh).

Scope: inference-style eval (BatchNorm running stats). Training under
spatial sharding additionally needs BN stat psums over SPATIAL_AXIS;
the DP path in parallel.mesh already shows that pattern over `data`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS, shard_map


def halo_exchange_rows(
    x: jnp.ndarray, axis_name: str = SPATIAL_AXIS, halo: int = 1
) -> jnp.ndarray:
    """Pad a row-sharded (B, H_loc, W, C) shard with `halo` rows from each
    mesh neighbor (zeros at the global edges).

    Two `ppermute`s: one shifting each shard's bottom rows down the mesh,
    one shifting top rows up. Non-wrapping permutations leave the edge
    devices' receive buffers zero — matching the backbone's explicit
    pad-1 zero padding, so no special-casing of the boundary shards.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([z, x, z], axis=1)
    top, bot = x[:, :halo], x[:, -halo:]
    from_above = lax.ppermute(
        bot, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = lax.ppermute(
        top, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([from_above, x, from_below], axis=1)


def conv3x3_halo(
    x: jnp.ndarray, kernel: jnp.ndarray, axis_name: str = SPATIAL_AXIS
) -> jnp.ndarray:
    """Stride-1 3x3 conv on a row-sharded shard: halo rows via ICI,
    columns zero-padded locally, then a VALID conv (the pad is already
    materialized). Output shape == input shape, sharded the same way."""
    xh = halo_exchange_rows(x, axis_name, halo=1)
    xh = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return lax.conv_general_dilated(
        xh,
        kernel.astype(x.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3s2_halo(
    x: jnp.ndarray, kernel: jnp.ndarray, axis_name: str = SPATIAL_AXIS
) -> jnp.ndarray:
    """Stride-2 3x3 conv (torch pad-1 convention, matching the backbone's
    explicit-pad stride-2 stages) on a row-sharded shard.

    With per-shard rows H_loc even and shards row-aligned (H % n == 0),
    shard s emits output rows [s*H_loc/2, (s+1)*H_loc/2): the conv window
    of output row k covers input rows 2k-1..2k+1, i.e. each shard needs
    exactly ONE halo row from the shard above (zero for shard 0 = the
    torch top pad) and none from below."""
    n = lax.axis_size(axis_name)
    assert x.shape[1] % 2 == 0, f"per-shard rows must be even, got {x.shape}"
    if n == 1:
        from_above = jnp.zeros_like(x[:, :1])
    else:
        from_above = lax.ppermute(
            x[:, -1:], axis_name, [(i, i + 1) for i in range(n - 1)]
        )
    xh = jnp.concatenate([from_above, x], axis=1)
    xh = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return lax.conv_general_dilated(
        xh,
        kernel.astype(x.dtype),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_eval(x, stats, eps=1e-5):
    """Eval-mode BatchNorm with flax's op ordering (per-channel affine)."""
    mul = stats["scale"] * lax.rsqrt(stats["var"] + eps)
    return (x - stats["mean"]) * mul + stats["bias"]


def _stem_shard(x, k0, bn0, k1, bn1):
    """Stage-0 ConvBlock body on one row shard: (conv3x3 - BN - relu) x2.

    Parameter layout matches models.backbone.ConvBlock in "plain" mode
    (Conv_{0,1} 3x3 stride-1 no-bias + BatchNorm_{0,1}), so the caller
    can feed an initialized encoder's stage-0 variables verbatim.
    """
    x = nn_relu(_bn_eval(conv3x3_halo(x, k0), bn0))
    x = nn_relu(_bn_eval(conv3x3_halo(x, k1), bn1))
    return x


def nn_relu(x):
    return jnp.maximum(x, 0)


def stem_params_from_variables(variables, block_name: str = "ConvBlock_0"):
    """Extract (k0, bn0, k1, bn1) for `_stem_shard` from an STPNEncoder's
    flax variables (params + batch_stats collections, plain mode)."""
    p = variables["params"][block_name]
    s = variables["batch_stats"][block_name]

    def bn(i):
        return {
            "scale": p[f"BatchNorm_{i}"]["scale"],
            "bias": p[f"BatchNorm_{i}"]["bias"],
            "mean": s[f"BatchNorm_{i}"]["mean"],
            "var": s[f"BatchNorm_{i}"]["var"],
        }

    return p["Conv_0"]["kernel"], bn(0), p["Conv_1"]["kernel"], bn(1)


def encoder_params_from_variables(variables, num_stages: int):
    """Extract per-stage (k0, bn0, k1, bn1) tuples for the full plain-mode
    STPNEncoder (models.backbone, s2d=False) from its flax variables."""
    return tuple(
        stem_params_from_variables(variables, f"ConvBlock_{i}")
        for i in range(num_stages)
    )


def _encoder_shard(x, stage_params):
    """Full STPN encoder on one row shard (eval BN): stage 0 is the
    stride-1 stem; stages 1+ open with a stride-2 halo conv. Returns all
    pyramid levels (each still row-sharded)."""
    feats = []
    for i, (k0, bn0, k1, bn1) in enumerate(stage_params):
        conv0 = conv3x3_halo if i == 0 else conv3x3s2_halo
        x = nn_relu(_bn_eval(conv0(x, k0), bn0))
        x = nn_relu(_bn_eval(conv3x3_halo(x, k1), bn1))
        feats.append(x)
    return tuple(feats)


def make_spatial_encoder(mesh, num_stages: int):
    """jit the full row-sharded STPN encoder over `mesh`'s SPATIAL_AXIS.

    Returns fn(x, stage_params) -> tuple of pyramid levels, everything
    sharded P(None, SPATIAL_AXIS). Constraint: the global H must keep
    per-shard rows even through every stride-2 stage, i.e.
    H % (spatial_size * 2**(num_stages-1)) == 0 — e.g. H=64 on a 4-way
    spatial axis for the 5-stage production encoder."""
    row = P(None, SPATIAL_AXIS)
    fn = shard_map(
        _encoder_shard,
        mesh=mesh,
        in_specs=(row, P()),
        out_specs=tuple(row for _ in range(num_stages)),
    )
    return jax.jit(fn)


def make_spatial_stem(mesh):
    """jit a row-sharded stage-0 stem over `mesh`'s SPATIAL_AXIS.

    Returns fn(x, k0, bn0, k1, bn1) -> y with x and y sharded
    P(None, SPATIAL_AXIS) (rows over chips) and params replicated.
    Global H must divide by the spatial axis size.
    """
    row = P(None, SPATIAL_AXIS)
    fn = shard_map(
        _stem_shard,
        mesh=mesh,
        in_specs=(row, P(), P(), P(), P()),
        out_specs=row,
    )
    return jax.jit(fn)


def shard_rows(x: jnp.ndarray, mesh) -> jnp.ndarray:
    """Place (B, H, W, C) with H sharded over the mesh's spatial axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, SPATIAL_AXIS))
    )
