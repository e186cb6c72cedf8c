"""Collaboration-benefit semantic test (SURVEY.md §4, VERDICT round-1 #4).

The reference's entire value proposition is that fusion lets an agent
detect vehicles it cannot see itself (/root/reference/README.md:99-101
benchmark tables). This test asserts that *semantically*, end to end:

  a GT box occluded for agent i but visible to agent j must be detected
  by agent i POST-FUSION, and must NOT be detected from agent i's own
  points alone (lowerbound ablation == same trained weights with the
  agent mask restricted to {i}; masked max fusion over one agent is
  exactly the ego-only model).

Training runs in-test on streaming synthetic scenes (fresh seed per
step, so nothing is memorized) with a width_mult=0.25 model — the exact
production architecture at CI cost (~500k params, ~0.1 s/step on CPU).

Max fusion is used because it preserves full-strength peer features
(mean fusion halves them), giving the sharpest CI-sized separation.
Margins are ~2.5x below measured behavior (width 0.25, 600 steps:
fused occluded-score mean 0.194, hits>0.3 48%; ego-only mean 0.008,
hits 0%; visible hits 97%) so the test fails on a broken fusion/warp
path, not on seed noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule

CFG = Config(
    grid=GridConfig(
        voxel_size=(2.0, 2.0, 1.25),
        area_extents=((-32, 32), (-32, 32), (-3, 2)),
    ),
    num_agents=2,
    fusion_layer=1,
)
SPEC = SyntheticSpec(
    num_vehicles=6,
    points_per_agent=512,
    max_gt=8,
    points_per_vehicle=48,
    occlusion_prob=0.45,
    lidar_range=40.0,
)
DROP = ("visible", "gt_vehicle")
STEPS = 600
BATCH = 4


def _to_batch(raw):
    return {k: jnp.asarray(v) for k, v in raw.items() if k not in DROP}


def _occluded_and_visible_scores(mod, state, raw, ego_only):
    """Best detection score within 3 m of each GT, split into
    (occluded-for-ego-but-peer-visible, visible-to-ego) groups."""
    batch = _to_batch(raw)
    B, A = np.asarray(batch["agent_mask"]).shape
    per_agent = []
    if ego_only:
        for i in range(A):
            am = np.zeros((B, A), bool)
            am[:, i] = True
            solo = dict(batch)
            solo["agent_mask"] = jnp.asarray(am)
            res = mod.predict(state, mod.prepare_batch(solo), 16, 0.1, 0.0)
            per_agent.append(
                (
                    np.asarray(res.boxes)[:, i],
                    np.asarray(res.scores)[:, i],
                    np.asarray(res.valid)[:, i],
                )
            )
    else:
        res = mod.predict(state, mod.prepare_batch(batch), 16, 0.1, 0.0)
        bx, sc, va = (
            np.asarray(res.boxes),
            np.asarray(res.scores),
            np.asarray(res.valid),
        )
        per_agent = [(bx[:, i], sc[:, i], va[:, i]) for i in range(A)]

    visible, gt_vehicle = raw["visible"], raw["gt_vehicle"]
    gt_mask, gt_boxes = raw["gt_mask"], raw["gt_boxes"]
    occ_scores, vis_scores = [], []
    for b in range(B):
        for i in range(A):
            j = 1 - i
            bx, sc, va = per_agent[i]
            for m in range(gt_mask.shape[2]):
                if not gt_mask[b, i, m]:
                    continue
                v = gt_vehicle[b, i, m]
                gx, gy = gt_boxes[b, i, m, :2]
                best = 0.0
                if va[b].any():
                    d = np.hypot(
                        bx[b, va[b], 0] - gx, bx[b, va[b], 1] - gy
                    )
                    near = d < 3.0
                    if near.any():
                        best = float(sc[b, va[b]][near].max())
                if visible[b, i, v]:
                    vis_scores.append(best)
                elif visible[b, j, v]:
                    occ_scores.append(best)
    return np.array(occ_scores), np.array(vis_scores)


pytestmark = pytest.mark.slow  # in-test training: ~4 min on 1 CPU core


def _train_fixture(mode):
    """Train the CI-scale model for `mode`, disk-cached across runs: the
    loop is bit-deterministic (fixed seeds, one CPU device), so the
    result is cached keyed on the package source hash (_fixture_cache)
    and retrains automatically on any v2x_sim_tpu/ change."""
    from tests._fixture_cache import cached_train
    from v2x_sim_tpu.train.det_module import TrainState

    mod = DetModule(CFG, mode=mode, learning_rate=3e-3, width_mult=0.25)

    def _train():
        raw0 = generate_batch(CFG, SPEC, batch_size=BATCH, seed=0)
        state = mod.init(jax.random.PRNGKey(0), _to_batch(raw0))
        for s in range(STEPS):
            raw = generate_batch(CFG, SPEC, batch_size=BATCH, seed=10_000 + s)
            state, _ = mod.train_step(
                state, mod.prepare_batch(_to_batch(raw))
            )
        return jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats}
        )

    blob = cached_train(f"collab_{mode}", _train)
    state = TrainState(
        params=blob["params"],
        batch_stats=blob["batch_stats"],
        opt_state=None,  # predict-only consumers below
        step=jnp.zeros((), jnp.int32),
    )
    return mod, state


@pytest.fixture(scope="module")
def trained():
    return _train_fixture("max")


def _gather(trained, ego_only):
    mod, state = trained
    occ, vis = [], []
    for es in range(3):
        raw = generate_batch(CFG, SPEC, batch_size=2, seed=77_000 + es)
        o, v = _occluded_and_visible_scores(mod, state, raw, ego_only)
        occ.append(o)
        vis.append(v)
    return np.concatenate(occ), np.concatenate(vis)


@pytest.fixture(scope="module")
def trained_disco():
    return _train_fixture("disco")


def test_learned_fusion_beats_lowerbound(trained_disco):
    """VERDICT-r2 #6 regression gate: the flagship *learned* fusion
    (disco's edge-weighted graph) must show the collaboration benefit,
    not just the parameter-free max fusion above.

    Margins are ~2.5x below the worst of 3 measured seeds (width 0.25,
    600 steps: occ_fused_mean 0.131-0.301, occ hits>0.3 0.29-0.67,
    vis hits 0.97, ego-only mean <=0.012 with 0 hits), so a real
    regression in disco's fusion/warp/training path trips it but seed
    noise does not."""
    occ_fused, vis_fused = _gather(trained_disco, ego_only=False)
    occ_ego, _ = _gather(trained_disco, ego_only=True)
    assert len(occ_fused) >= 10, "spec should yield occluded cases"

    assert (vis_fused > 0.3).mean() > 0.6, (
        f"visible recall collapsed: {vis_fused}"
    )
    assert occ_fused.mean() > 0.05, (
        f"disco brings no occluded signal: mean {occ_fused.mean():.3f}"
    )
    assert (occ_fused > 0.3).mean() > 0.1, (
        f"disco detects too few occluded boxes: {occ_fused}"
    )
    assert occ_ego.mean() < occ_fused.mean() / 3.0, (
        f"ego-only {occ_ego.mean():.3f} vs fused {occ_fused.mean():.3f}"
    )
    assert (occ_ego > 0.3).mean() < 0.1, (
        f"lowerbound should not see occluded boxes: {occ_ego}"
    )


def test_fusion_detects_occluded_lowerbound_does_not(trained):
    occ_fused, vis_fused = _gather(trained, ego_only=False)
    occ_ego, _ = _gather(trained, ego_only=True)
    assert len(occ_fused) >= 10, "spec should yield occluded cases"

    # The model actually learned the task: ego-visible vehicles detected.
    assert (vis_fused > 0.3).mean() > 0.6, (
        f"visible recall collapsed: {vis_fused}"
    )
    # Semantic payoff: occluded-for-ego vehicles carry real fused score...
    assert occ_fused.mean() > 0.08, (
        f"fusion brings no occluded signal: mean {occ_fused.mean():.3f}"
    )
    assert (occ_fused > 0.3).mean() > 0.2, (
        f"fusion detects too few occluded boxes: {occ_fused}"
    )
    # ...and the lowerbound ablation (same weights, ego-only mask) has
    # essentially none: the information provably travelled agent j -> i.
    assert occ_ego.mean() < occ_fused.mean() / 3.0, (
        f"ego-only {occ_ego.mean():.3f} vs fused {occ_fused.mean():.3f}"
    )
    assert (occ_ego > 0.3).mean() < 0.1, (
        f"lowerbound should not see occluded boxes: {occ_ego}"
    )
