"""Anchor system tests (goldens from ``/root/reference/levels_test.py``)."""

import numpy as np

from retinanet_tpu.config import AnchorConfig
from retinanet_tpu.ops.anchors import Level, Levels, build_levels, compute_box_size


def test_compute_box_size():
    # levels_test.py:5-9: area preserved, aspect ratio respected.
    box_size = compute_box_size(32, (1, 2), 1)
    assert len(box_size) == 2
    assert np.isclose(box_size.prod(), 32 ** 2)
    assert box_size[1] / box_size[0] == 2


def test_level_anchor_boxes():
    # levels_test.py:12-14 golden values.
    level = Level(32, ((1, 4),), (2 ** 0, 2 ** 1))
    np.testing.assert_array_equal(level.anchor_sizes, [[16, 64], [32, 128]])


def test_build_levels_defaults():
    levels = build_levels()
    assert set(levels.keys()) == {"P3", "P4", "P5", "P6", "P7"}
    assert levels.num_anchors == 9
    # Base sizes double per level (levels.py:10-16).
    for k, base in zip(range(3, 8), (32, 64, 128, 256, 512)):
        sizes = levels[f"P{k}"].anchor_sizes
        assert sizes.shape == (9, 2)
        # (1,1) aspect, scale 1 anchor is exactly (base, base).
        np.testing.assert_allclose(sizes[3], [base, base])


def test_strides_and_grids():
    assert Levels.stride("P3") == 8
    assert Levels.stride("P7") == 128
    levels = build_levels()
    assert levels.grid_size("P3", 640) == 80
    assert levels.grid_size("P7", 640) == 5
    # ceil division for non-multiple sizes (dataset.py:57).
    assert levels.grid_size("P3", 500) == 63


def test_normalized_anchor_sizes():
    levels = build_levels()
    norm = levels.normalized_anchor_sizes("P3", 640)
    np.testing.assert_allclose(norm[3], [32 / 640, 32 / 640], atol=1e-7)


def test_custom_config():
    cfg = AnchorConfig(aspect_ratios=((1, 1),), scale_ratios=(1.0,))
    levels = build_levels(cfg)
    assert levels.num_anchors == 1
