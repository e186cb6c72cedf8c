"""Synthetic scene generator invariants."""

import numpy as np

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch, generate_scene

CFG = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)), num_agents=4)
SPEC = SyntheticSpec(num_vehicles=6, points_per_agent=1024, max_gt=8)


def test_shapes_and_padding():
    s = generate_scene(CFG, SPEC, seed=0)
    a, p = CFG.num_agents, SPEC.points_per_agent
    assert s["points"].shape == (a, p, 3)
    assert s["trans"].shape == (a, a, 4, 4)
    assert s["gt_boxes"].shape == (a, SPEC.max_gt, 5)
    assert s["seg_labels"].shape == (a,) + CFG.grid.bev_shape


def test_trans_consistency():
    """trans[i,j] @ trans[j,i] == I and trans[i,i] == I."""
    s = generate_scene(CFG, SPEC, seed=1)
    t = s["trans"]
    a = t.shape[0]
    for i in range(a):
        np.testing.assert_allclose(t[i, i], np.eye(4), atol=1e-5)
        for j in range(a):
            np.testing.assert_allclose(t[i, j] @ t[j, i], np.eye(4), atol=1e-5)


def test_gt_consistent_across_agents():
    """A vehicle in agent i's GT, moved through trans[j,i], matches some
    GT entry of agent j (when inside j's extents)."""
    s = generate_scene(CFG, SPEC, seed=2)
    t, gt, gm = s["trans"], s["gt_boxes"], s["gt_mask"]
    found_any = False
    for i in range(CFG.num_agents):
        for gi in np.nonzero(gm[i])[0]:
            center = np.array([gt[i, gi, 0], gt[i, gi, 1], 0.0, 1.0])
            for j in range(CFG.num_agents):
                if j == i:
                    continue
                cj = (t[j, i] @ center)[:2]
                if gm[j].any():
                    d = np.linalg.norm(gt[j, gm[j], :2] - cj, axis=-1)
                    if d.min() < 1e-3:
                        found_any = True
    assert found_any


def test_points_lie_on_visible_vehicles():
    """Non-ground points in agent frame sit near some GT vehicle box."""
    s = generate_scene(CFG, SPEC, seed=3)
    i = 0
    pts = s["points"][i][s["point_mask"][i]]
    obj = pts[pts[:, 2] > -1.6]  # above ground band
    if len(obj) == 0:
        return
    gt = s["gt_boxes"][i][s["gt_mask"][i]]
    if len(gt) == 0:
        return
    d = np.linalg.norm(
        obj[:, None, :2] - gt[None, :, :2], axis=-1
    ).min(1)
    # Perimeter points are within ~half a diagonal of a GT center —
    # except points of vehicles that are outside this agent's extents.
    assert np.median(d) < 4.0


def test_batch_stacking():
    b = generate_batch(CFG, SPEC, batch_size=3, seed=0)
    assert b["points"].shape[0] == 3
    assert b["agent_mask"].shape == (3, CFG.num_agents)


def test_sequence_ids_persist_and_motion_is_bounded():
    """generate_sequence: persistent identities, bounded per-frame motion
    (tracking-table contract — tools/bench_table_track.py)."""
    from v2x_sim_tpu.datasets.synthetic import generate_sequence

    dt, vmax = 0.5, 8.0
    frames = generate_sequence(CFG, SPEC, seed=5, num_frames=6, dt=dt,
                               speed_range=(1.0, vmax))
    assert len(frames) == 6
    for fr in frames:
        assert fr["gt_ids"].shape == fr["gt_mask"].shape
        # padded slots carry -1, valid slots a real vehicle id
        assert (fr["gt_ids"][~fr["gt_mask"]] == -1).all()
        assert (fr["gt_ids"][fr["gt_mask"]] >= 0).all()

    # RSU (agent 0) is static: a vehicle's consecutive positions in its
    # frame move at most speed*dt (+ slack for the boundary bounce clamp).
    for t in range(5):
        a, b = frames[t], frames[t + 1]
        ids_a = {int(i): a["gt_boxes"][0, m, :2]
                 for m, i in enumerate(a["gt_ids"][0]) if a["gt_mask"][0, m]}
        moved = 0
        for m, i in enumerate(b["gt_ids"][0]):
            if not b["gt_mask"][0, m] or int(i) not in ids_a:
                continue
            d = np.linalg.norm(b["gt_boxes"][0, m, :2] - ids_a[int(i)])
            assert d <= vmax * dt + 1e-5, f"id {i} jumped {d:.2f} m"
            moved += 1
        assert moved >= 1, "no persistent ids between consecutive frames"


def test_sequence_occlusion_is_persistent():
    """A vehicle occluded for an agent must stay occluded the whole
    sequence (the premise that lets collaboration keep tracks alive)."""
    from v2x_sim_tpu.datasets.synthetic import generate_sequence

    # With lidar_range >> world, visibility is purely the occlusion draw
    # (range never drops anyone), so per-(agent, vehicle) it must be
    # constant across the whole sequence iff the draw is frozen.
    spec_far = SyntheticSpec(
        num_vehicles=6, points_per_agent=1024, max_gt=8,
        occlusion_prob=0.5, lidar_range=1e9
    )
    frames = generate_sequence(CFG, spec_far, seed=11, num_frames=5)
    vis = np.stack([fr["visible"] for fr in frames])  # (T, A, nv)
    assert (vis == vis[0]).all(), "occlusion must be frozen per sequence"
