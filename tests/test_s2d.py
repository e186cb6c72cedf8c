"""Space-to-depth execution layout vs the plain NHWC path.

models.s2d re-executes the full-res conv stages on a 2x2-blocked layout
with transformed kernels; these tests assert the math is unchanged: same
parameter tree, equal outputs (f32), equal BatchNorm statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.models.det.net import DetModel
from v2x_sim_tpu.models.s2d import (
    s2d_conv,
    s2d_kernel,
    s2d_stride2_kernel,
    s2d_upsample2x,
    space_to_depth,
    depth_to_space,
)


def test_space_to_depth_roundtrip():
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 3)).astype(np.float32)
    back = depth_to_space(space_to_depth(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(back), x)


def _plain_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_kernel_stride1_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    want = _plain_conv(x, w, 1)
    got = depth_to_space(s2d_conv(space_to_depth(x), s2d_kernel(w), True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_s2d_kernel_stride2_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    want = _plain_conv(x, w, 2)
    got = s2d_conv(space_to_depth(x), s2d_stride2_kernel(w), False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_s2d_upsample_matches_resize():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 7, 4)).astype(np.float32))
    want = jax.image.resize(x, (2, 18, 14, 4), method="bilinear")
    got = depth_to_space(s2d_upsample2x(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _setup_model(s2d):
    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8
    return cfg, DetModel(config=cfg, mode="disco", s2d=s2d)


def test_det_model_s2d_matches_plain():
    cfg, plain = _setup_model(False)
    _, blocked = _setup_model(True)
    rng = np.random.default_rng(4)
    b, a = 1, 3
    occ = jnp.asarray(
        (rng.random((b, a, 64, 64, 8)) > 0.95).astype(np.float32)
    )
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1, 0, 3] = 4.0
    trans = jnp.asarray(trans)
    mask = jnp.ones((b, a), bool)

    variables = plain.init(jax.random.PRNGKey(0), occ, trans, mask, train=False)
    # Identical param tree: the blocked model must accept the plain vars.
    out_p = plain.apply(variables, occ, trans, mask, train=False)
    out_b = blocked.apply(variables, occ, trans, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b.cls_logits), np.asarray(out_p.cls_logits), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_b.reg), np.asarray(out_p.reg), atol=2e-4
    )

    # Train mode: outputs and updated BN stats must match too.
    op, mp = plain.apply(
        variables, occ, trans, mask, train=True, mutable=["batch_stats"]
    )
    ob, mb = blocked.apply(
        variables, occ, trans, mask, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(ob.cls_logits), np.asarray(op.cls_logits), atol=2e-4
    )
    flat_p = jax.tree_util.tree_leaves_with_path(mp["batch_stats"])
    flat_b = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(mb["batch_stats"])
    }
    assert len(flat_p) > 0
    for k, v in flat_p:
        np.testing.assert_allclose(
            flat_b[jax.tree_util.keystr(k)], np.asarray(v), atol=2e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_blocked_training_loss_matches_standard():
    """DetModule's blocked-head training path must produce the same loss
    as an unblocked module (same params, targets permuted to match)."""
    import jax.numpy as jnp
    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
    from v2x_sim_tpu.train.det_module import DetModule

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))
    spec = SyntheticSpec(
        num_vehicles=4, points_per_agent=512, max_gt=8, points_per_vehicle=32
    )
    raw = generate_batch(cfg, spec, batch_size=1, seed=5)
    batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

    mod_b = DetModule(cfg, mode="disco")
    assert mod_b._blocked
    mod_p = DetModule(cfg, mode="disco")
    mod_p._blocked = False
    mod_p.model = mod_p.eval_model  # plain heads + plain-order targets

    state = mod_b.init(jax.random.PRNGKey(0), batch)
    prep_b = mod_b.prepare_batch(batch)
    prep_p = mod_p.prepare_batch(batch)
    _, (_, metrics_b) = mod_b.loss_fn(
        state.params, state.batch_stats, prep_b, None, True
    )
    _, (_, metrics_p) = mod_p.loss_fn(
        state.params, state.batch_stats, prep_p, None, True
    )
    for key in ("cls_loss", "loc_loss", "loss"):
        np.testing.assert_allclose(
            float(metrics_b[key]), float(metrics_p[key]), rtol=1e-4,
            err_msg=key,
        )


def test_seg_model_s2d_matches_plain():
    """The s2d UNet must equal the plain UNet on the same params."""
    from v2x_sim_tpu.models.seg.unet import SegModel

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8
    plain = SegModel(config=cfg, mode="mean", s2d=False)
    blocked = SegModel(config=cfg, mode="mean", s2d=True)
    rng = np.random.default_rng(6)
    b, a = 1, 2
    occ = jnp.asarray((rng.random((b, a, 64, 64, 8)) > 0.95).astype(np.float32))
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1, 0, 3] = 4.0
    trans = jnp.asarray(trans)
    mask = jnp.ones((b, a), bool)

    variables = plain.init(jax.random.PRNGKey(0), occ, trans, mask, train=False)
    out_p = plain.apply(variables, occ, trans, mask, train=False)
    out_b = blocked.apply(variables, occ, trans, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b.logits), np.asarray(out_p.logits), atol=2e-4
    )

    # Train mode: outputs + updated BN stats equal too.
    op, mp = plain.apply(
        variables, occ, trans, mask, train=True, mutable=["batch_stats"]
    )
    ob, mb = blocked.apply(
        variables, occ, trans, mask, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(ob.logits), np.asarray(op.logits), atol=2e-4
    )
    flat_b = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(mb["batch_stats"])
    }
    for k, v in jax.tree_util.tree_leaves_with_path(mp["batch_stats"]):
        np.testing.assert_allclose(
            flat_b[jax.tree_util.keystr(k)], np.asarray(v), atol=2e-4,
            err_msg=jax.tree_util.keystr(k),
        )
