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

Manual-path training scope: `make_spatial_stem_train_step` runs a full
optimization step of the STAGE-0 STEM ONLY under row sharding —
train-mode BatchNorm whose batch statistics are `pmean`'d over
SPATIAL_AXIS, gradients flowing through the `ppermute` halo exchange
(its transpose is the reverse ppermute, so cross-shard cotangents ride
the same ICI links), and a grad psum across shards; tests/test_spatial.py
asserts exact equivalence of loss, updated params, and updated BN
running stats against the unsharded flax ConvBlock train step. It is a
mechanism proof, not the production path: FULL-MODEL spatially-sharded
training runs through GSPMD (DetModel/SegModel `spatial_mesh` pins +
XLA's automatic halo exchange — __graft_entry__ dryrun variants C/D),
where the partitioner emits these same collectives without the manual
bookkeeping. See docs/SCALING.md for when each path applies.
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


def _bn_train_shard(
    x, scale, bias, mean_ra, var_ra, axis_name, momentum=0.9, eps=1e-5
):
    """Train-mode BatchNorm on a row shard: batch statistics are the
    GLOBAL (B, H, W) moments, obtained by `pmean`ing the local moments
    over the spatial axis (shards are equal-sized, so the mean of local
    means is the global mean). Matches flax nn.BatchNorm semantics
    (use_fast_variance: var = E[x^2] - E[x]^2; running stats updated with
    the batch moments at `momentum`)."""
    axes = (0, 1, 2)
    mean = x.mean(axes)
    msq = (x * x).mean(axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        msq = lax.pmean(msq, axis_name)
    var = msq - mean * mean
    y = (x - mean) * lax.rsqrt(var + eps) * scale + bias
    new_mean = momentum * mean_ra + (1.0 - momentum) * mean
    new_var = momentum * var_ra + (1.0 - momentum) * var
    return y, new_mean, new_var


def _stem_shard_train(
    x, params, stats, axis_name=SPATIAL_AXIS, momentum=0.9, eps=1e-5
):
    """Stage-0 ConvBlock body in TRAIN mode on one row shard.

    `params` / `stats` use the flax ConvBlock tree layout
    (Conv_{0,1}.kernel, BatchNorm_{0,1}.{scale,bias} / {mean,var}) so the
    caller can feed `variables["params"]["ConvBlock_0"]` verbatim.
    Returns (activations shard, updated batch_stats tree) — the stats are
    already global (pmean'd), identical on every shard."""
    new_stats = {}
    h = x
    for i in range(2):
        h = conv3x3_halo(h, params[f"Conv_{i}"]["kernel"], axis_name)
        bn_p = params[f"BatchNorm_{i}"]
        bn_s = stats[f"BatchNorm_{i}"]
        h, m, v = _bn_train_shard(
            h, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
            axis_name, momentum, eps,
        )
        new_stats[f"BatchNorm_{i}"] = {"mean": m, "var": v}
        h = nn_relu(h)
    return h, new_stats


def make_spatial_stem_train_step(mesh, learning_rate: float = 0.1):
    """jit one SGD training step of the row-sharded stage-0 stem.

    Returns fn(params, stats, x, target) -> (new_params, new_stats, loss)
    with x/target sharded P(None, SPATIAL_AXIS) and params replicated.
    Loss = global mean squared error vs `target`. Gradients are computed
    per shard (flowing through the halo ppermutes) and psum'd, so the
    update equals the unsharded full-batch SGD step exactly
    (tests/test_spatial.py::test_spatial_stem_train_step_matches_flax).
    """
    row = P(None, SPATIAL_AXIS)

    def step(params, stats, x, target):
        def local_loss(p):
            y, new_stats = _stem_shard_train(x, p, stats)
            return ((y - target) ** 2).sum(), (new_stats, y.size)

        (lsum, (new_stats, numel)), g = jax.value_and_grad(
            local_loss, has_aux=True
        )(params)
        denom = lax.psum(jnp.asarray(numel, lsum.dtype), SPATIAL_AXIS)
        loss = lax.psum(lsum, SPATIAL_AXIS) / denom
        g = jax.tree.map(
            lambda t: lax.psum(t, SPATIAL_AXIS) / denom, g
        )
        new_params = jax.tree.map(
            lambda p, gg: p - learning_rate * gg, params, g
        )
        return new_params, new_stats, loss

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), row, row),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(fn)


def shard_rows(x: jnp.ndarray, mesh) -> jnp.ndarray:
    """Place (B, H, W, C) with H sharded over the mesh's spatial axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, SPATIAL_AXIS))
    )
