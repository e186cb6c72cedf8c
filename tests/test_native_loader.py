"""Native C++ loader vs the numpy fallback oracle."""

import numpy as np
import pytest

from v2x_sim_tpu.native.loader import (
    _read_pcd_batch_numpy,
    native_available,
    read_pcd_batch,
)


@pytest.fixture
def pcd_files(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([100, 4096, 10000, 0]):
        rec = rng.standard_normal((n, 5)).astype(np.float32)
        p = tmp_path / f"sweep_{i}.pcd.bin"
        rec.tofile(p)
        paths.append(str(p))
    return paths


def test_native_builds():
    assert native_available(), "g++ build of libv2xloader.so failed"


def test_matches_numpy(pcd_files):
    pts_n, mask_n = read_pcd_batch(pcd_files, max_points=8192)
    pts_r, mask_r = _read_pcd_batch_numpy(pcd_files, 8192, 5, None)
    np.testing.assert_array_equal(mask_n, mask_r)
    np.testing.assert_allclose(pts_n, pts_r, atol=0)
    # truncation + padding behavior
    assert mask_n[0].sum() == 100
    assert mask_n[1].sum() == 4096
    assert mask_n[2].sum() == 8192  # truncated from 10000
    assert mask_n[3].sum() == 0


def test_transforms_applied(pcd_files):
    n = len(pcd_files)
    rng = np.random.default_rng(1)
    transforms = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    yaw = 0.7
    transforms[:, 0, 0] = np.cos(yaw)
    transforms[:, 0, 1] = -np.sin(yaw)
    transforms[:, 1, 0] = np.sin(yaw)
    transforms[:, 1, 1] = np.cos(yaw)
    transforms[:, 0, 3] = 5.0
    pts_n, _ = read_pcd_batch(pcd_files, 2048, transforms=transforms)
    pts_r, _ = _read_pcd_batch_numpy(pcd_files, 2048, 5, transforms)
    np.testing.assert_allclose(pts_n, pts_r, atol=1e-5)


def test_missing_file_raises(tmp_path, pcd_files):
    if not native_available():
        pytest.skip("no native lib")
    with pytest.raises(FileNotFoundError):
        read_pcd_batch([pcd_files[0], str(tmp_path / "nope.pcd.bin")], 128)
