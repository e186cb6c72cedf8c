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
