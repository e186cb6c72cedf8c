"""BEV rasterization utilities."""

import numpy as np

from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.utils.mapping import (
    build_seg_labels,
    rasterize_boxes,
    rasterize_polygon,
)

CFG = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))


def test_polygon_square_area():
    square = np.array([[-8, -8], [8, -8], [8, 8], [-8, 8]], np.float64)
    mask = rasterize_polygon(CFG, square)
    # 16x16 m at 1m cells ~ 256 cells
    assert abs(int(mask.sum()) - 256) <= 32


def test_polygon_winding_invariant():
    tri = np.array([[0, 0], [10, 0], [0, 10]], np.float64)
    m1 = rasterize_polygon(CFG, tri)
    m2 = rasterize_polygon(CFG, tri[::-1])
    np.testing.assert_array_equal(m1, m2)
    assert abs(int(m1.sum()) - 50) <= 12  # triangle area 50


def test_box_footprint_rotation_invariant_area():
    b0 = np.array([[0, 0, 8, 4, 0.0]])
    b1 = np.array([[0, 0, 8, 4, 0.9]])
    a0 = int(rasterize_boxes(CFG, b0).sum())
    a1 = int(rasterize_boxes(CFG, b1).sum())
    assert abs(a0 - 32) <= 6
    assert abs(a1 - 32) <= 8


def test_build_seg_labels_layering():
    road = [np.array([[-16, -16], [16, -16], [16, 16], [-16, 16]], np.float64)]
    vehicles = np.array([[0, 0, 4, 2, 0.2]])
    labels = build_seg_labels(CFG, vehicles, [("road", road)])
    names = CFG.seg_class_names
    assert (labels == names.index("road")).sum() > 500
    assert (labels == names.index("vehicle")).sum() >= 4
    # vehicle paints on top of road
    assert labels[32, 32] == names.index("vehicle")
