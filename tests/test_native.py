"""Native host library tests: build, bind, and match the numpy reference."""

import numpy as np
import pytest

from retinanet_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_iou_matrix_matches_numpy(lib):
    from retinanet_tpu.eval_coco import _box_iou_matrix
    rng = np.random.RandomState(0)
    a = np.sort(rng.rand(16, 2, 2), axis=1).transpose(0, 2, 1).reshape(16, 4)
    b = np.sort(rng.rand(8, 2, 2), axis=1).transpose(0, 2, 1).reshape(8, 4)
    a, b = a.astype(np.float32), b.astype(np.float32)
    got = native.iou_matrix(a, b)
    want = _box_iou_matrix(a, b)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_nms_matches_python(lib):
    rng = np.random.RandomState(1)
    n = 100
    centers = rng.rand(n, 2) * 0.8 + 0.1
    sizes = rng.rand(n, 2) * 0.3 + 0.05
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           -1).astype(np.float32)
    scores = -np.sort(-rng.rand(n).astype(np.float32))

    got = native.nms_keep(boxes, 0.5)

    # Python greedy reference.
    keep = np.ones(n, bool)
    for i in range(n):
        if not keep[i]:
            continue
        iou = native.iou_matrix(boxes[i:i + 1], boxes)[0]
        sup = (iou > 0.5) & (np.arange(n) > i)
        keep &= ~sup
    np.testing.assert_array_equal(got, keep)


def test_resize_normalize_matches_numpy(lib):
    rng = np.random.RandomState(2)
    image = rng.randint(0, 256, (50, 30, 3), np.uint8)
    mean = np.array([0.4, 0.45, 0.5], np.float32)
    std = np.array([0.25, 0.3, 0.28], np.float32)
    canvas_size, nh, nw = 64, 64, 38

    got = native.resize_normalize(image, canvas_size, nh, nw, mean, std)
    assert got.shape == (64, 64, 3)

    try:
        import cv2
        resized = cv2.resize(image, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
    except ImportError:
        pytest.skip("cv2 unavailable for reference comparison")
    want = np.full((canvas_size, canvas_size, 3), 0, np.float32)
    want[:nh, :nw] = resized.astype(np.float32) / 255.0
    want = (want - mean) / std
    # cv2 bilinear is fixed-point; ±2 uint8 LSB ≈ 0.028 normalized units.
    np.testing.assert_allclose(got, want, atol=3e-2)
    # Padding region must be exact.
    np.testing.assert_allclose(got[nh:, :], want[nh:, :], atol=1e-6)


def test_pipeline_native_vs_numpy_paths():
    from retinanet_tpu.data.pipeline import process_sample
    rng = np.random.RandomState(3)
    sample = {"image": rng.randint(0, 256, (80, 60, 3), np.uint8),
              "boxes": np.array([[5, 5, 40, 30]], np.float32),
              "class_ids": np.array([1], np.int32)}
    mean = np.array([0.4, 0.4, 0.4], np.float32)
    std = np.array([0.3, 0.3, 0.3], np.float32)
    a = process_sample(sample, 64, mean, std, 4, flip=False, use_native=True)
    b = process_sample(sample, 64, mean, std, 4, flip=False,
                       use_native=False)
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    if native.get_lib() is not None:
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-2)
