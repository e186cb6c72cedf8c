"""BEV spatial sharding (parallel.spatial): the row-sharded halo-exchange
conv stage must be numerically identical to the unsharded backbone stage.

Runs on the 8-virtual-device CPU mesh from conftest, with the mesh's
`spatial` axis at size 8 (data=1) — the configuration SURVEY.md §5
reserved and VERDICT round-1 #9 asked to demonstrate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2x_sim_tpu.models.backbone import ConvBlock, STPNEncoder
from v2x_sim_tpu.parallel.mesh import make_mesh
from v2x_sim_tpu.parallel.spatial import (
    conv3x3_halo,
    halo_exchange_rows,
    make_spatial_stem,
    shard_rows,
    stem_params_from_variables,
)
from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS, shard_map
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(num_devices=8, spatial=8)


def test_halo_exchange_rows(mesh):
    """Each shard's halo == its neighbor's edge rows (zeros at mesh edge).

    Gathered along W so shard i's padded rows sit at columns [16i, 16i+16):
    shard i carries global rows [4i-1, 4i+4] with zero rows where the
    neighbor doesn't exist.
    """
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16, 8))

    fn = jax.jit(
        shard_map(
            lambda s: halo_exchange_rows(s),
            mesh=mesh,
            in_specs=(P(None, SPATIAL_AXIS),),
            out_specs=P(None, None, SPATIAL_AXIS),  # gather shards along W
        )
    )
    out = np.asarray(fn(shard_rows(x, mesh)))
    assert out.shape == (2, 6, 8 * 16, 8)
    xn = np.asarray(x)
    for i in range(8):
        shard = out[:, :, 16 * i : 16 * (i + 1)]
        lo, hi = 4 * i, 4 * i + 4
        np.testing.assert_array_equal(shard[:, 1:5], xn[:, lo:hi])
        if i > 0:
            np.testing.assert_array_equal(shard[:, 0], xn[:, lo - 1])
        else:
            np.testing.assert_array_equal(shard[:, 0], 0 * xn[:, 0])
        if i < 7:
            np.testing.assert_array_equal(shard[:, 5], xn[:, hi])
        else:
            np.testing.assert_array_equal(shard[:, 5], 0 * xn[:, 0])


def test_conv3x3_halo_exact(mesh):
    """Row-sharded 3x3 conv == plain pad-1 conv, elementwise."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 32, 24, 8))
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * 0.1

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    fn = jax.jit(
        shard_map(
            lambda s, kk: conv3x3_halo(s, kk),
            mesh=mesh,
            in_specs=(P(None, SPATIAL_AXIS), P()),
            out_specs=P(None, SPATIAL_AXIS),
        )
    )
    got = fn(shard_rows(x, mesh), k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_spatial_stem_matches_convblock(mesh):
    """Stage-0 STPN stem (conv-BN-relu x2) sharded 8-way over rows ==
    the unsharded ConvBlock apply, with the encoder's own variables."""
    enc = STPNEncoder(s2d=False, stage_channels=(16, 24))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 13))
    variables = enc.init(jax.random.PRNGKey(4), x, train=False)
    # Perturb batch_stats away from init (mean 0 / var 1) so the BN eval
    # path is actually exercised.
    variables = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) / v.size
        if v.ndim == 1
        else v,
        variables,
    )

    block = ConvBlock(16, stride=1, mode="plain")
    blk_vars = {
        "params": variables["params"]["ConvBlock_0"],
        "batch_stats": variables["batch_stats"]["ConvBlock_0"],
    }
    ref = block.apply(blk_vars, x, train=False)

    stem = make_spatial_stem(mesh)
    k0, bn0, k1, bn1 = stem_params_from_variables(variables)
    got = stem(shard_rows(x, mesh), k0, bn0, k1, bn1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_spatial_full_encoder_matches_plain():
    """All 5 STPN encoder stages (stride-1 stem + 4 stride-2 stages) run
    row-sharded on a 4-way spatial axis and match the unsharded encoder
    at every pyramid level."""
    from v2x_sim_tpu.parallel.spatial import (
        encoder_params_from_variables,
        make_spatial_encoder,
    )

    mesh4 = make_mesh(num_devices=4, spatial=4)
    chans = (8, 12, 16, 20, 24)
    enc = STPNEncoder(s2d=False, stage_channels=chans)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 13))
    variables = enc.init(jax.random.PRNGKey(6), x, train=False)
    variables = jax.tree.map(
        lambda v: v
        + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) / v.size
        if v.ndim == 1
        else v,
        variables,
    )
    ref_feats = enc.apply(variables, x, train=False)

    fn = make_spatial_encoder(mesh4, num_stages=5)
    params = encoder_params_from_variables(variables, 5)
    got_feats = fn(shard_rows(x, mesh4), params)

    assert len(got_feats) == 5
    for lvl, (got, ref) in enumerate(zip(got_feats, ref_feats)):
        assert got.shape == ref.shape, (lvl, got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4,
            err_msg=f"pyramid level {lvl}",
        )


def test_spatial_stem_train_step_matches_flax(mesh):
    """One SGD train step of the stage-0 stem, 8-way row-sharded with
    BN-stat pmean over SPATIAL_AXIS and grads psum'd through the halo
    ppermutes, == the unsharded flax ConvBlock train step: same loss,
    same updated params, same updated BN running stats (VERDICT r2 #8)."""
    from v2x_sim_tpu.parallel.spatial import make_spatial_stem_train_step

    lr = 0.1
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 32, 16, 13))
    target = jax.random.normal(jax.random.PRNGKey(21), (2, 32, 16, 16))
    block = ConvBlock(16, stride=1, mode="plain")
    variables = block.init(jax.random.PRNGKey(22), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    # Unsharded flax reference: loss -> grads -> SGD update + BN stats.
    def flax_loss(p):
        y, mut = block.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((y - target) ** 2), mut["batch_stats"]

    (ref_loss, ref_stats), ref_g = jax.value_and_grad(
        flax_loss, has_aux=True
    )(params)
    ref_params = jax.tree.map(lambda p, g: p - lr * g, params, ref_g)

    step = make_spatial_stem_train_step(mesh, learning_rate=lr)
    new_params, new_stats, loss = step(
        params, stats, shard_rows(x, mesh), shard_rows(target, mesh)
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for got, ref in zip(
        jax.tree.leaves(new_params), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )
    for got, ref in zip(
        jax.tree.leaves(new_stats), jax.tree.leaves(ref_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_gspmd_full_model_spatial_sharding(mesh):
    """The whole DetModel forward (encoder + disco fusion + decoder +
    heads) runs under plain jit with the BEV row axis pinned to the
    8-way spatial mesh axis — XLA's SPMD partitioner inserts the halo
    exchanges — and matches the unsharded model.

    This is the production scaling path; parallel.spatial is the
    manual-control analog of the same partitioning."""
    from jax.sharding import NamedSharding, PartitionSpec as P2

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.models.det.net import DetModel
    from v2x_sim_tpu.ops.voxelize import voxelize_batch
    from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS

    mesh_s = make_mesh(num_devices=8, spatial=8)
    cfg = Config(
        grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)),  # 64x64x8
        num_agents=2,
        fusion_layer=2,
    )
    spec = SyntheticSpec(
        num_vehicles=4, points_per_agent=512, max_gt=8, points_per_vehicle=32
    )
    raw = generate_batch(cfg, spec, batch_size=1, seed=7)
    occ = voxelize_batch(
        jnp.asarray(raw["points"]), jnp.asarray(raw["point_mask"]), cfg.grid
    )
    trans = jnp.asarray(raw["trans"])
    am = jnp.asarray(raw["agent_mask"])

    plain = DetModel(config=cfg, mode="disco", s2d=False, width_mult=0.25)
    variables = plain.init(jax.random.PRNGKey(0), occ, trans, am, train=False)
    ref = jax.jit(
        lambda v, o, t, m: plain.apply(v, o, t, m, train=False)
    )(variables, occ, trans, am)

    sharded_model = DetModel(
        config=cfg, mode="disco", s2d=False, width_mult=0.25,
        spatial_mesh=mesh_s,
    )
    occ_sh = jax.device_put(
        occ, NamedSharding(mesh_s, P2(None, None, SPATIAL_AXIS))
    )
    got = jax.jit(
        lambda v, o, t, m: sharded_model.apply(v, o, t, m, train=False)
    )(variables, occ_sh, trans, am)

    np.testing.assert_allclose(
        np.asarray(got.cls_logits), np.asarray(ref.cls_logits),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got.reg), np.asarray(ref.reg), atol=2e-4, rtol=1e-4
    )


def test_gspmd_seg_model_spatial_sharding():
    """SegModel (UNet + bottleneck fusion) under GSPMD row sharding ==
    unsharded, same contract as DetModel.spatial_mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P2

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.models.seg.unet import SegModel
    from v2x_sim_tpu.ops.voxelize import voxelize_batch
    from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS

    mesh_s = make_mesh(num_devices=8, spatial=8)
    cfg = Config(
        grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)), num_agents=2
    )
    spec = SyntheticSpec(
        num_vehicles=4, points_per_agent=512, max_gt=8, points_per_vehicle=32
    )
    raw = generate_batch(cfg, spec, batch_size=1, seed=9)
    occ = voxelize_batch(
        jnp.asarray(raw["points"]), jnp.asarray(raw["point_mask"]), cfg.grid
    )
    trans = jnp.asarray(raw["trans"])
    am = jnp.asarray(raw["agent_mask"])

    plain = SegModel(config=cfg, mode="mean", s2d=False, width_mult=0.25)
    variables = plain.init(jax.random.PRNGKey(0), occ, trans, am, train=False)
    ref = plain.apply(variables, occ, trans, am, train=False)

    sharded = SegModel(
        config=cfg, mode="mean", s2d=False, width_mult=0.25,
        spatial_mesh=mesh_s,
    )
    occ_sh = jax.device_put(
        occ, NamedSharding(mesh_s, P2(None, None, SPATIAL_AXIS))
    )
    got = jax.jit(
        lambda v, o, t, m: sharded.apply(v, o, t, m, train=False)
    )(variables, occ_sh, trans, am)
    np.testing.assert_allclose(
        np.asarray(got.logits), np.asarray(ref.logits), atol=2e-4, rtol=1e-4
    )


def test_gspmd_tensor_parallel_channel_sharding():
    """Tensor parallelism on the channel axis: with the input feature
    map's C_in sharded over the mesh axis, XLA partitions the 3x3 conv's
    channel contraction (each device holds a kernel slice; partial
    products meet in an all-reduce) — numerically equal to unsharded.

    Complements the row-sharding (sp) tests: same GSPMD machinery, the
    natural axis for the 512-channel deep stages when BEV maps get small.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P2
    from v2x_sim_tpu.parallel.mesh import SPATIAL_AXIS

    mesh_s = make_mesh(num_devices=8, spatial=8)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 16, 64))
    k = jax.random.normal(jax.random.PRNGKey(12), (3, 3, 64, 32)) * 0.05

    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = conv(x, k)

    x_sh = jax.device_put(
        x, NamedSharding(mesh_s, P2(None, None, None, SPATIAL_AXIS))
    )
    k_sh = jax.device_put(
        k, NamedSharding(mesh_s, P2(None, None, SPATIAL_AXIS, None))
    )
    got = jax.jit(conv)(x_sh, k_sh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
