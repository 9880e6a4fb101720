"""Golden-value tests for box geometry.

The expected arrays are the reference's hand-computed goldens from
``/root/reference/utils_test.py`` and ``retinanet_old_test.py`` (the math is
the spec; the stale reference APIs are not).
"""

import jax.numpy as jnp
import numpy as np

from retinanet_tpu.ops import boxes as box_ops


def test_boxmap_anchor_relative_to_image_relative():
    # utils_test.py:7-42: 3x4 grid, one anchor, constant offset box.
    c = [[0.5, 1.0, 0.25, 0.75]]
    regression = jnp.asarray([[c] * 4] * 3)[None]  # [1, 3, 4, 1, 4]

    expected = np.array([
        [[[y / 6 + 0.5, x / 8 + 1.0, 0.25, 0.75]] for x in (1, 3, 5, 7)]
        for y in (1, 3, 5)
    ])[None]

    actual = box_ops.boxmap_anchor_relative_to_image_relative(regression)
    assert actual.shape == (1, 3, 4, 1, 4)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-6)


def test_anchor_boxmap():
    # utils_test.py:44-74: 3x4 grid, one anchor of size (0.2, 0.4).
    anchor_sizes = jnp.asarray([[0.2, 0.4]])
    expected = np.array([
        [[[y / 6 - 0.1, x / 8 - 0.2, y / 6 + 0.1, x / 8 + 0.2]]
         for x in (1, 3, 5, 7)]
        for y in (1, 3, 5)
    ])

    actual = box_ops.anchor_boxmap(3, 4, anchor_sizes)
    assert actual.shape == (3, 4, 1, 4)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-6)


def test_boxmap_center_relative_to_corner_relative():
    # utils_test.py:76-97.
    c = [[0.5, 1.0, 0.2, 0.4]]
    regression = jnp.asarray([[c] * 4] * 3)[None]
    e = [[0.4, 0.8, 0.6, 1.2]]
    expected = np.asarray([[e] * 4] * 3)[None]

    actual = box_ops.boxmap_center_relative_to_corner_relative(regression)
    assert actual.shape == (1, 3, 4, 1, 4)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-6)


def test_iou_golden():
    # utils_test.py:99-118 incl. disjoint and degenerate boxes.
    box_a = jnp.asarray([
        [0.1, 0.1, 0.2, 0.2],
        [100, 100, 200, 200],
        [0.1, 0.1, 0.2, 0.2],
        [1.0, 1.0, 1.0, 1.0],
    ])
    box_b = jnp.asarray([
        [0.1, 0.1, 0.3, 0.3],
        [100, 100, 300, 300],
        [100, 100, 300, 300],
        [0.0, 0.0, 0.0, 0.0],
    ])
    actual = box_ops.iou(box_a, box_b)
    np.testing.assert_allclose(np.asarray(actual), [0.25, 0.25, 0.0, 0.0],
                               atol=1e-6)


def test_pairwise_iou():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.5, 0.5]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    out = box_ops.pairwise_iou(a, b)
    np.testing.assert_allclose(np.asarray(out), [[1.0], [0.25]], atol=1e-6)


def test_scale_regression():
    # retinanet_old_test.py:15-40.
    regression = jnp.asarray([
        [0.5, 1.0, 0.5, 1.0],
        [0.5, 0.5, 0.5, 0.5],
    ]).reshape(1, 1, 1, 2, 4)
    anchor_sizes = jnp.asarray([[0.2, 0.4], [0.4, 0.2]])

    expected = np.asarray([
        [0.1, 0.4, 0.1, 0.4],
        [0.2, 0.1, 0.2, 0.1],
    ]).reshape(1, 1, 1, 2, 4)

    actual = box_ops.scale_regression(regression, anchor_sizes)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-6)


def test_regression_postprocess():
    # retinanet_old_test.py:42-57: 2x2 grid, one (0.5, 0.5) anchor.
    log2 = float(np.log(2.0))
    anchor_sizes = jnp.asarray([[0.5, 0.5]])
    regression = jnp.asarray([
        [[[0.5, 0.5, 0.0, 0.0]], [[0.0, 0.0, 0.0, 0.0]]],
        [[[0.0, 0.0, 0.0, 0.0]], [[-0.5, -0.5, log2, log2]]],
    ])[None]
    # NOTE: the stale reference test passed raw scales (1.0 / 2.0) to a
    # version of regression_postprocess without exp(); the current reference
    # code (utils.py:116-126) applies exp to log-scales, so raw scales s
    # become log(s) here and decode to the same goldens.
    # Zero raw rows decode to the anchor box at the cell center (exp(0)=1
    # times the anchor size) — the stale test's degenerate point-boxes for
    # those rows predate the exp decoding.
    expected = np.asarray([
        [[[0.25, 0.25, 0.75, 0.75]], [[0.0, 0.5, 0.5, 1.0]]],
        [[[0.5, 0.0, 1.0, 0.5]], [[0.0, 0.0, 1.0, 1.0]]],
    ])[None]

    actual = box_ops.regression_postprocess(regression, anchor_sizes)
    assert actual.shape == (1, 2, 2, 1, 4)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    h = w = 4
    anchor_sizes = jnp.asarray([[0.3, 0.3], [0.2, 0.5]])
    # Random boxes near each cell.
    raw = rng.uniform(-0.4, 0.4, size=(1, h, w, 2, 4)).astype(np.float32)
    decoded = box_ops.regression_postprocess(jnp.asarray(raw), anchor_sizes)

    # Re-encode each decoded box against its anchor; should equal raw.
    grid = np.asarray(box_ops.position_grid(h, w))[:, :, None, :]
    center = np.asarray(box_ops.to_center_box(decoded))[0]
    sizes = np.broadcast_to(np.asarray(anchor_sizes)[None, None], (h, w, 2, 2))
    reencoded = np.asarray(box_ops.encode_boxes(
        jnp.asarray(center), jnp.asarray(np.broadcast_to(grid, sizes.shape)),
        jnp.asarray(sizes)))
    np.testing.assert_allclose(reencoded, raw[0], atol=1e-5)


def test_center_corner_roundtrip():
    boxes = jnp.asarray([[0.1, 0.2, 0.5, 0.9], [0.0, 0.0, 1.0, 1.0]])
    back = box_ops.from_center_box(box_ops.to_center_box(boxes))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-6)
