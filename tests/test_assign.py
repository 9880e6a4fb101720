"""Label-assignment tests.

Golden values hand-derived from the reference semantics at
``/root/reference/dataset.py:43-121`` (the shipped ``dataset_test.py`` is
stale — it predates the shift/log-scale encoding; SURVEY.md §4).  The setup
mirrors it: a 32×32 image, 4 boxes, a 2-anchor level at stride 16, covering a
perfect match (fg), plain background, the 0.4–0.5 ignore band, and the
bg-uses-POS-threshold quirk.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import AssignConfig
from retinanet_tpu.ops import assign
from retinanet_tpu.ops.anchors import build_levels

LOG_23 = math.log(2 / 3)


def _setup():
    # Image 32x32; boxes in pixels normalized to [0,1].
    boxes = np.array([
        [0, 0, 16, 16],
        [8, 8, 24, 24],
        [16, 16, 32, 32],
        [-4, -4, 20, 20],
    ], np.float32) / 32.0
    class_ids = np.array([1, 2, 0, 1], np.int32)
    # Level(16, [(1,1)], [1, 1.5]) → anchor sizes 16 and 24 px → 0.5, 0.75.
    anchor_sizes = np.array([[0.5, 0.5], [0.75, 0.75]], np.float32)
    return boxes, class_ids, anchor_sizes


def test_level_labels_golden():
    boxes, class_ids, anchor_sizes = _setup()
    cls, regr, mask = assign.level_labels(
        jnp.asarray(boxes), jnp.asarray(class_ids),
        jnp.ones(4, dtype=bool), jnp.asarray(anchor_sizes),
        grid_h=2, grid_w=2, num_classes=3)

    assert cls.shape == (2, 2, 2, 3)
    assert regr.shape == (2, 2, 2, 4)
    assert mask.shape == (2, 2, 2)

    # fg anchors: (0,0,A0)=box0 IoU 1.0 class 1; (0,0,A1)=box3 IoU 1.0
    # class 1; (1,1,A0)=box2 IoU 1.0 class 0.  (1,1,A1) matches box2 at
    # IoU 4/9 → ignore band (bg but NOT trainable).  Everything else bg.
    expected_cls = np.zeros((2, 2, 2, 3), np.float32)
    expected_cls[0, 0, 0, 1] = 1
    expected_cls[0, 0, 1, 1] = 1
    expected_cls[1, 1, 0, 0] = 1
    np.testing.assert_array_equal(np.asarray(cls), expected_cls)

    expected_mask = np.ones((2, 2, 2), bool)
    expected_mask[1, 1, 1] = False  # IoU 0.444... in the 0.4–0.5 band
    np.testing.assert_array_equal(np.asarray(mask), expected_mask)

    expected_regr = np.array([
        [  # row 0
            [[0, 0, 0, 0],            # (0,0,A0) matched box0 exactly
             [0, 0, 0, 0]],           # (0,0,A1) matched box3 exactly
            [[0.5, -0.5, 0, 0],       # (0,1,A0) bg, matched box1
             [1/3, -1/3, LOG_23, LOG_23]],
        ],
        [  # row 1
            [[-0.5, 0.5, 0, 0],       # (1,0,A0) bg, matched box1
             [-1/3, 1/3, LOG_23, LOG_23]],
            [[0, 0, 0, 0],            # (1,1,A0) matched box2 exactly
             [0, 0, LOG_23, LOG_23]], # (1,1,A1) ignore band, matched box2
        ],
    ], np.float32)
    np.testing.assert_allclose(np.asarray(regr), expected_regr, atol=1e-5)


def test_padding_invariance():
    """Adding masked-out padded boxes must not change any output."""
    boxes, class_ids, anchor_sizes = _setup()
    base = assign.level_labels(
        jnp.asarray(boxes), jnp.asarray(class_ids), jnp.ones(4, dtype=bool),
        jnp.asarray(anchor_sizes), 2, 2, 3)

    padded_boxes = np.concatenate(
        [boxes, np.zeros((6, 4), np.float32)], axis=0)
    padded_ids = np.concatenate([class_ids, np.zeros(6, np.int32)])
    padded_mask = np.concatenate([np.ones(4, bool), np.zeros(6, bool)])
    padded = assign.level_labels(
        jnp.asarray(padded_boxes), jnp.asarray(padded_ids),
        jnp.asarray(padded_mask), jnp.asarray(anchor_sizes), 2, 2, 3)

    for a, b in zip(base, padded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_no_valid_boxes():
    """All-padded input: everything bg + trainable, finite regression."""
    _, _, anchor_sizes = _setup()
    cls, regr, mask = assign.level_labels(
        jnp.zeros((4, 4)), jnp.zeros(4, jnp.int32), jnp.zeros(4, dtype=bool),
        jnp.asarray(anchor_sizes), 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(cls), 0)
    np.testing.assert_array_equal(np.asarray(mask), True)
    assert np.all(np.isfinite(np.asarray(regr)))


def test_neg_threshold_mode():
    """bg_uses_pos_threshold=False → paper behaviour: bg iff IoU < 0.4, so
    the 0.444-IoU anchor keeps its matched class but stays ignored."""
    boxes, class_ids, anchor_sizes = _setup()
    cfg = AssignConfig(bg_uses_pos_threshold=False)
    cls, _, mask = assign.level_labels(
        jnp.asarray(boxes), jnp.asarray(class_ids), jnp.ones(4, dtype=bool),
        jnp.asarray(anchor_sizes), 2, 2, 3, cfg)
    assert np.asarray(cls)[1, 1, 1, 0] == 1  # class kept (IoU .444 >= 0.4)
    assert not np.asarray(mask)[1, 1, 1]     # still ignored


def test_build_labels_shapes():
    levels = build_levels()
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5]])
    cls, regr, mask = assign.build_labels(
        boxes, jnp.asarray([0]), jnp.ones(1, dtype=bool),
        image_size=64, levels=levels, num_classes=3)
    assert set(cls.keys()) == {"P3", "P4", "P5", "P6", "P7"}
    for k in cls:
        g = levels.grid_size(k, 64)
        assert cls[k].shape == (g, g, 9, 3)
        assert regr[k].shape == (g, g, 9, 4)
        assert mask[k].shape == (g, g, 9)


def test_build_labels_batch_vmap_and_jit():
    levels = build_levels()
    b, m = 2, 5
    boxes = jnp.zeros((b, m, 4)).at[:, 0].set(
        jnp.asarray([0.2, 0.2, 0.6, 0.6]))
    ids = jnp.zeros((b, m), jnp.int32)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)

    fn = jax.jit(lambda bx, ci, mk: assign.build_labels_batch(
        bx, ci, mk, image_size=64, levels=levels, num_classes=2))
    cls, regr, tm = fn(boxes, ids, mask)
    assert cls["P3"].shape == (b, 8, 8, 9, 2)
    # Both batch elements identical input → identical labels.
    np.testing.assert_allclose(np.asarray(cls["P5"][0]),
                               np.asarray(cls["P5"][1]))
    # Some anchor at some level should be foreground for a centered box.
    total_fg = sum(float(jnp.sum(cls[k])) for k in cls)
    assert total_fg > 0


def test_match_chunk_bitexact_vs_dense():
    """The chunked-scan matcher is bit-exact vs the direct dense reduction,
    including first-wins ties (duplicate boxes) and all-padded inputs, for
    chunk sizes that do and don't divide MAX_BOXES."""
    rng = np.random.RandomState(7)
    max_boxes = 23
    tl = rng.rand(max_boxes, 2) * 0.6
    br = tl + rng.rand(max_boxes, 2) * 0.4 + 0.01
    boxes = np.concatenate([tl, br], -1).astype(np.float32)
    boxes[5] = boxes[2]   # exact duplicates → IoU ties across chunks
    boxes[21] = boxes[2]
    class_ids = rng.randint(0, 3, size=max_boxes).astype(np.int32)
    levels = build_levels()

    for mask in (np.ones(max_boxes, bool),
                 rng.rand(max_boxes) < 0.5,
                 np.zeros(max_boxes, bool)):
        dense = assign.build_labels(
            jnp.asarray(boxes), jnp.asarray(class_ids), jnp.asarray(mask),
            64, levels, 3, AssignConfig(max_boxes=max_boxes, match_chunk=0))
        for chunk in (1, 4, 23, 40):
            chunked = assign.build_labels(
                jnp.asarray(boxes), jnp.asarray(class_ids),
                jnp.asarray(mask), 64, levels, 3,
                AssignConfig(max_boxes=max_boxes, match_chunk=chunk))
            for d, c in zip(dense, chunked):
                for pn in d:
                    np.testing.assert_array_equal(np.asarray(d[pn]),
                                                  np.asarray(c[pn]))
