"""nuScenes-format reader round-trip vs the synthetic writer."""

import numpy as np
import pytest

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.datasets.nuscenes import (
    NuScenesTables,
    V2XSimDataset,
    pose_matrix,
    quat_to_yaw,
)
from v2x_sim_tpu.datasets.nuscenes_writer import write_synthetic_nuscenes
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec

CFG = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)), num_agents=3)
SPEC = SyntheticSpec(num_vehicles=5, points_per_agent=512, max_gt=8)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    write_synthetic_nuscenes(
        str(root), CFG, SPEC, num_scenes=2, frames_per_scene=3, seed=1
    )
    return str(root)


def test_quat_yaw_roundtrip():
    for yaw in [-2.5, -0.3, 0.0, 1.1, 3.0]:
        q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
        assert abs(quat_to_yaw(q) - yaw) < 1e-6


def test_pose_matrix_identity():
    np.testing.assert_allclose(pose_matrix([0, 0, 0], [1, 0, 0, 0]), np.eye(4))


def test_tables_index(dataset_root):
    t = NuScenesTables(dataset_root)
    assert len(t.scene_samples) == 2
    for samples in t.scene_samples.values():
        assert len(samples) == 3
    # every sample has at least one lidar agent indexed
    for samples in t.scene_samples.values():
        for s in samples:
            assert s in t.sample_lidars


def test_dataset_frames_and_shapes(dataset_root):
    ds = V2XSimDataset(dataset_root, CFG, max_points=512, max_gt=8)
    assert len(ds) == 6
    item = ds[0]
    a = CFG.num_agents
    assert item["points"].shape == (a, 512, 3)
    assert item["trans"].shape == (a, a, 4, 4)
    assert item["agent_mask"].any()
    # transform consistency
    t = item["trans"]
    for i in range(a):
        np.testing.assert_allclose(t[i, i], np.eye(4), atol=1e-5)


def test_gt_projects_consistently(dataset_root):
    """GT of agent i, moved through trans[j, i], appears in agent j's GT."""
    ds = V2XSimDataset(dataset_root, CFG, max_points=512, max_gt=8)
    item = ds[0]
    t, gt, gm, am = item["trans"], item["gt_boxes"], item["gt_mask"], item["agent_mask"]
    checked = 0
    for i in range(CFG.num_agents):
        if not am[i]:
            continue
        for gi in np.nonzero(gm[i])[0]:
            c = np.array([gt[i, gi, 0], gt[i, gi, 1], 0, 1.0])
            for j in range(CFG.num_agents):
                if j == i or not am[j] or not gm[j].any():
                    continue
                cj = (t[j, i] @ c)[:2]
                d = np.linalg.norm(gt[j, gm[j], :2] - cj, axis=-1).min()
                if d < 1e-2:
                    checked += 1
    assert checked > 0


def test_batches_iterator(dataset_root):
    ds = V2XSimDataset(dataset_root, CFG, max_points=512, max_gt=8)
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 3
    assert batches[0]["points"].shape[0] == 2


def test_map_layer_seg_labels_all_classes(dataset_root):
    """Real-data-format fixture must yield ALL 8 seg classes (VERDICT
    round-1 task 5): map-expansion polygons (road/sidewalk/terrain/
    building/vegetation) + pedestrian annotations + vehicle boxes."""
    ds = V2XSimDataset(
        dataset_root, CFG, max_points=2048, max_gt=16, with_seg_labels=True
    )
    seg = ds[0]["seg_labels"]
    present = set(np.unique(seg).tolist())
    assert present == set(range(len(CFG.seg_class_names)))


def test_map_expansion_both_record_schemas(dataset_root):
    """The parser must resolve canonical node/polygon token references
    (road layers in the fixture) AND inline-exterior records (the other
    layers)."""
    from v2x_sim_tpu.datasets.nuscenes_map import NuScenesMapExpansion

    exp = NuScenesMapExpansion(dataset_root, "synthetic")
    # road_segment (polygon_token) + drivable_area (polygon_tokens).
    assert len(exp.layer_polys["road_segment"]) == 1
    assert len(exp.layer_polys["drivable_area"]) == 1
    assert exp.layer_polys["road_segment"][0].shape == (4, 2)
    # inline exteriors
    assert len(exp.layer_polys["walkway"]) == 2
    classes = dict(exp.class_polygons(CFG.seg_class_names))
    assert len(classes["road"]) == 2
    assert len(classes["sidewalk"]) == 2


def test_real_instance_track_ids(dataset_root):
    """gt_ids carry instance_token-derived identities, stable across the
    frames of a scene (the same vehicle keeps its id)."""
    ds = V2XSimDataset(dataset_root, CFG, max_points=2048, max_gt=16)
    f0, f1 = ds[0], ds[1]
    ids0 = f0["gt_ids"][0][f0["gt_mask"][0]]
    ids1 = f1["gt_ids"][0][f1["gt_mask"][0]]
    assert (ids0 >= 0).all() and len(set(ids0.tolist())) == len(ids0)
    # writer drifts vehicles only slightly: identity sets overlap heavily
    assert len(set(ids0.tolist()) & set(ids1.tolist())) >= max(1, len(ids0) - 2)


# --------------------------------------------------------------------- #
# Irregular real-data shapes (VERDICT r2 #9): non-keyframe sweeps,
# duplicate keyframes, RSU-absent / missing-agent scenes.
# --------------------------------------------------------------------- #


def test_non_keyframe_sweeps_are_ignored(tmp_path):
    """Intermediate `is_key_frame=False` sweep rows (pointing at decoy
    empty files) must not displace the keyframe in the index, and frames
    must load the real points."""
    root = str(tmp_path / "sweeps")
    write_synthetic_nuscenes(
        root, CFG, SPEC, num_scenes=1, frames_per_scene=2, seed=3,
        sweep_rows=2,
    )
    t = NuScenesTables(root)
    for samples in t.scene_samples.values():
        for s in samples:
            for sd in t.sample_lidars[s].values():
                assert sd["is_key_frame"]
                assert "decoy" not in sd["filename"]
    ds = V2XSimDataset(root, CFG, max_points=512, max_gt=8)
    item = ds[0]
    assert item["point_mask"][item["agent_mask"]].any(axis=1).all()


def test_duplicate_keyframes_pick_newest(tmp_path):
    """Two keyframe rows per (sample, agent): the reader must pick the
    newest timestamp (the one with real points), deterministically —
    not whichever JSON row order delivered last."""
    root = str(tmp_path / "dups")
    write_synthetic_nuscenes(
        root, CFG, SPEC, num_scenes=1, frames_per_scene=2, seed=4,
        duplicate_keyframes=True,
    )
    t = NuScenesTables(root)
    for samples in t.scene_samples.values():
        for s in samples:
            for sd in t.sample_lidars[s].values():
                assert "decoy" not in sd["filename"]
    ds = V2XSimDataset(root, CFG, max_points=512, max_gt=8)
    for i in range(len(ds)):
        item = ds[i]
        # every present agent carries real (non-decoy) points
        assert item["point_mask"][item["agent_mask"]].any(axis=1).all()


def test_rsu_absent_and_missing_agents(tmp_path):
    """A scene where only agents 1..2 have lidar (no RSU, fewer vehicles
    than the config allows): agent_mask reflects reality, GT exists only
    for present agents, and the batch iterator still works."""
    root = str(tmp_path / "partial")
    write_synthetic_nuscenes(
        root, CFG, SPEC, num_scenes=1, frames_per_scene=2, seed=5,
        present_agents=(1, 2),
    )
    ds = V2XSimDataset(root, CFG, max_points=512, max_gt=8)
    assert len(ds) == 2
    item = ds[0]
    np.testing.assert_array_equal(
        item["agent_mask"], np.array([False, True, True])
    )
    assert not item["gt_mask"][0].any()
    assert item["gt_mask"][1].any() and item["gt_mask"][2].any()
    assert not item["point_mask"][0].any()
    batches = list(ds.batches(batch_size=2))
    assert batches and batches[0]["points"].shape[0] == 2


def test_malformed_lidar_channel_is_skipped(tmp_path):
    """A sample_data row with a non-integer channel suffix must be
    skipped, not crash the index build."""
    import json
    import os

    root = str(tmp_path / "badchan")
    write_synthetic_nuscenes(
        root, CFG, SPEC, num_scenes=1, frames_per_scene=1, seed=6
    )
    path = os.path.join(root, "v1.0-mini", "sample_data.json")
    with open(path) as f:
        rows = json.load(f)
    bad = dict(rows[0])
    bad["token"] = "bad" * 10
    bad["channel"] = "LIDAR_TOP_id_x"
    rows.append(bad)
    with open(path, "w") as f:
        json.dump(rows, f)
    t = NuScenesTables(root)  # must not raise
    ds = V2XSimDataset(root, CFG, max_points=512, max_gt=8)
    assert len(ds) == 1
