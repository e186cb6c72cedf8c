"""Train-module smoke tests: loss decreases, fusion modes step, seg/mIoU.

Module-level tests per SURVEY.md §4: tiny grid (32x32), A=2, few steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule
from v2x_sim_tpu.train.seg_module import SegModule
from v2x_sim_tpu.utils.seg_metrics import iou_from_confusion

CFG = Config(
    grid=GridConfig(voxel_size=(2.0, 2.0, 1.25), area_extents=((-32, 32), (-32, 32), (-3, 2))),
    num_agents=2,
)
SPEC = SyntheticSpec(
    num_vehicles=4, points_per_agent=512, max_gt=8, points_per_vehicle=32
)


@pytest.fixture(scope="module")
def batch():
    raw = generate_batch(CFG, SPEC, batch_size=1, seed=5)
    return {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}


def test_det_loss_decreases(batch):
    mod = DetModule(CFG, mode="lowerbound", learning_rate=2e-3)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    _, m0 = mod.train_step(state, prepared)
    state = mod.init(jax.random.PRNGKey(0), batch)
    for _ in range(25):
        state, m = mod.train_step(state, prepared)
    assert float(m["loss"]) < 0.5 * float(m0["loss"])


@pytest.mark.parametrize("mode", ["mean", "disco", "v2v", "when2com", "upperbound"])
def test_det_modes_step_and_predict(batch, mode):
    mod = DetModule(CFG, mode=mode, learning_rate=1e-3)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared)
    assert np.isfinite(float(m["loss"]))
    res = mod.predict(state, prepared, 16, 0.1, 0.0)
    assert res.boxes.shape[-2:] == (16, 5)
    assert np.isfinite(np.asarray(res.boxes)).all()


@pytest.mark.parametrize("mode", ["sum", "max", "cat", "agent", "who2com"])
def test_det_remaining_modes_step_and_predict(batch, mode):
    """The other half of the 11-mode zoo (VERDICT r1 weak #5) — stepped
    at width_mult=0.25 so the extra coverage stays cheap."""
    mod = DetModule(CFG, mode=mode, learning_rate=1e-3, width_mult=0.25)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared)
    assert np.isfinite(float(m["loss"]))
    res = mod.predict(state, prepared, 16, 0.1, 0.0)
    assert res.boxes.shape[-2:] == (16, 5)
    assert np.isfinite(np.asarray(res.boxes)).all()


def test_det_kd_distillation_runs(batch):
    mod = DetModule(CFG, mode="disco", kd_weight=10.0)
    state = mod.init(jax.random.PRNGKey(0), batch)
    teacher_vars = mod.teacher.init(
        jax.random.PRNGKey(1),
        mod.merged_occupancy(
            batch["points"], batch["point_mask"], batch["trans"], batch["agent_mask"]
        ),
        train=False,
    )
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared, teacher_vars)
    assert "kd_loss" in m and np.isfinite(float(m["kd_loss"]))

    # kd_reduce="pos": same MSE sum normalized by the positive-anchor
    # count instead of the element count — with identical init/teacher
    # the reported kd_loss must change (and stay finite).
    mod_p = DetModule(CFG, mode="disco", kd_weight=10.0, kd_reduce="pos")
    state_p = mod_p.init(jax.random.PRNGKey(0), batch)
    _, m_p = mod_p.train_step(state_p, prepared, teacher_vars)
    assert np.isfinite(float(m_p["kd_loss"]))
    assert float(m_p["kd_loss"]) != float(m["kd_loss"])


def test_seg_overfits_and_miou(batch):
    mod = SegModule(CFG, mode="lowerbound", learning_rate=3e-3)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    _, m0 = mod.train_step(state, prepared)
    state = mod.init(jax.random.PRNGKey(0), batch)
    for _ in range(30):
        state, m = mod.train_step(state, prepared)
    assert float(m["loss"]) < float(m0["loss"])
    pred, cm = mod.eval_step(state, prepared)
    assert pred.shape == (1, CFG.num_agents) + CFG.grid.bev_shape
    metrics = iou_from_confusion(np.asarray(cm))
    assert 0.0 <= metrics["miou"] <= 1.0


def test_seg_fusion_mode_steps(batch):
    mod = SegModule(CFG, mode="disco")
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared)
    assert np.isfinite(float(m["loss"]))


def test_seg_width_mult_steps(batch):
    """width_mult scales the UNet like DetModel; step + eval stay sound."""
    mod = SegModule(CFG, mode="max", width_mult=0.25)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared)
    assert np.isfinite(float(m["loss"]))
    pred, cm = mod.eval_step(state, prepared)
    assert pred.shape == (1, CFG.num_agents) + CFG.grid.bev_shape
    # Bottleneck actually shrank: 512 -> 128.
    k = state.params["bottleneck"]["Conv_0"]["kernel"]
    assert k.shape[-1] == 128, k.shape


def test_conv_lstm_cell_shapes_and_memory():
    """ConvLSTM parity item: gates update state; forget gate preserves
    memory when inputs vanish."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from v2x_sim_tpu.models.convrnn import ConvLSTMCell

    cell = ConvLSTMCell(features=8)
    h = jnp.zeros((2, 16, 16, 8))
    c = jnp.zeros((2, 16, 16, 8))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 4)), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), (h, c), x)
    h1, c1 = cell.apply(params, (h, c), x)
    assert h1.shape == h.shape and c1.shape == c.shape
    assert float(jnp.abs(h1).sum()) > 0.0
    # Second step with zero input: state evolves smoothly (no NaNs).
    h2, c2 = cell.apply(params, (h1, c1), jnp.zeros_like(x))
    assert np.isfinite(np.asarray(h2)).all() and np.isfinite(np.asarray(c2)).all()


@pytest.mark.parametrize("layer", [0, 1, 4])
def test_det_fusion_layer_ablation(batch, layer):
    """Reference --layer k ablation: fusion at the stem (k=0 forces the
    plain non-s2d path), mid-pyramid, and the deepest stage all step and
    predict."""
    cfg_l = Config(grid=CFG.grid, num_agents=2, fusion_layer=layer)
    mod = DetModule(cfg_l, mode="mean", width_mult=0.25)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared)
    assert np.isfinite(float(m["loss"]))
    res = mod.predict(state, prepared, 8, 0.1, 0.0)
    assert np.isfinite(np.asarray(res.boxes)).all()


def test_det_mgda_with_kd_runs(batch):
    """MGDA + KD: three task backwards share ONE hoisted teacher forward
    (review round-2); weights sum to 1 and losses stay finite."""
    mod = DetModule(CFG, mode="disco", kd_weight=10.0, mgda=True,
                    width_mult=0.25)
    state = mod.init(jax.random.PRNGKey(0), batch)
    teacher_vars = mod.teacher.init(
        jax.random.PRNGKey(1),
        mod.merged_occupancy(
            batch["points"], batch["point_mask"], batch["trans"],
            batch["agent_mask"],
        ),
        train=False,
    )
    prepared = mod.prepare_batch(batch)
    state, m = mod.train_step(state, prepared, teacher_vars)
    assert np.isfinite(float(m["kd_loss"]))
    wsum = sum(float(v) for k, v in m.items() if k.startswith("mgda_w_"))
    assert abs(wsum - 1.0) < 1e-5


def test_v2v_rounds_and_msg_norm_step(batch):
    """Diagnostic knobs (docs/V2V_DIAGNOSIS.md): rounds=1 and the opt-in
    message GroupNorm must train a finite step; msg_norm adds params."""
    mod = DetModule(CFG, mode="v2v", v2v_rounds=1, v2v_msg_norm=True)
    state = mod.init(jax.random.PRNGKey(0), batch)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    assert any("msg_norm" in str(p) for p, _ in flat)
    state, m = mod.train_step(state, mod.prepare_batch(batch))
    assert np.isfinite(float(m["loss"]))


def test_det_grad_clip_bounds_the_update(batch):
    """grad_clip chains clip_by_global_norm before Adam (the reference
    FaFModule clips between backward and step — SURVEY.md §2.1;
    remediation knob for docs/UPPERBOUND_DIAGNOSIS.md). At init the
    unclipped focal gradient norm is O(100); with clip=1.0 the clipped
    transform must produce a bounded first Adam update and still train
    to a finite, decreasing loss."""
    import optax

    mod = DetModule(CFG, mode="upperbound", learning_rate=2e-3, grad_clip=1.0)
    state = mod.init(jax.random.PRNGKey(0), batch)
    prepared = mod.prepare_batch(batch)

    g = jax.grad(
        lambda p: mod.loss_fn(p, state.batch_stats, prepared, None, True)[0]
    )(state.params)
    assert float(optax.global_norm(g)) > 10.0  # raw init gradient is huge
    clipped, _ = optax.clip_by_global_norm(1.0).update(g, None)
    assert float(optax.global_norm(clipped)) <= 1.0 + 1e-4

    losses = []
    for _ in range(12):
        state, m = mod.train_step(state, prepared)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
