"""mAP evaluation tests against hand-computable cases."""

import numpy as np

from retinanet_tpu.eval_coco import (
    _average_precision, _box_iou_matrix, evaluate_detections)


def test_iou_matrix():
    a = np.array([[0, 0, 2, 2]], np.float32)
    b = np.array([[0, 0, 2, 2], [1, 1, 3, 3], [5, 5, 6, 6]], np.float32)
    got = _box_iou_matrix(a, b)
    np.testing.assert_allclose(got, [[1.0, 1 / 7, 0.0]], atol=1e-6)


def test_perfect_detections_map_1():
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
            "class_ids": np.array([0, 1])}]
    dets = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
             "class_ids": np.array([0, 1]),
             "scores": np.array([0.9, 0.8])}]
    out = evaluate_detections(dets, gts, num_classes=2)
    assert out["mAP"] == 1.0
    assert out["AP50"] == 1.0
    assert out["AP75"] == 1.0


def test_no_detections_map_0():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]),
            "class_ids": np.array([0])}]
    dets = [{"boxes": np.zeros((0, 4)), "class_ids": np.zeros(0, int),
             "scores": np.zeros(0)}]
    out = evaluate_detections(dets, gts, num_classes=1)
    assert out["mAP"] == 0.0


def test_half_recall():
    # Two GT, one perfect detection → precision 1 at recall .5, then 0.
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
            "class_ids": np.array([0, 0])}]
    dets = [{"boxes": np.array([[0, 0, 10, 10]]),
             "class_ids": np.array([0]), "scores": np.array([0.9])}]
    out = evaluate_detections(dets, gts, num_classes=1)
    # 101-pt interp: precision 1 for recall ≤ 0.5 (51 points) → 51/101.
    np.testing.assert_allclose(out["AP50"], 51 / 101, atol=1e-6)


def test_false_positive_lowers_precision():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "class_ids": np.array([0])}]
    dets = [{"boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]]),
             "class_ids": np.array([0, 0]),
             "scores": np.array([0.95, 0.9])}]  # FP ranked first
    out = evaluate_detections(dets, gts, num_classes=1)
    # Recall 1 reached at precision 1/2.
    np.testing.assert_allclose(out["AP50"], 0.5, atol=1e-6)


def test_localization_threshold_sensitivity():
    # IoU with GT = 0.69: counts at thresholds ≤0.65 but not ≥0.70.
    gts = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
            "class_ids": np.array([0])}]
    dets = [{"boxes": np.array([[0, 0, 10, 6.9]], np.float32),
             "class_ids": np.array([0]), "scores": np.array([0.9])}]
    out = evaluate_detections(dets, gts, num_classes=1)
    assert out["AP50"] == 1.0
    assert out["AP75"] == 0.0
    assert 0 < out["mAP"] < 1


def test_class_confusion_is_fp():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "class_ids": np.array([1])}]
    dets = [{"boxes": np.array([[0, 0, 10, 10]]),
             "class_ids": np.array([0]), "scores": np.array([0.9])}]
    out = evaluate_detections(dets, gts, num_classes=2)
    assert out["mAP"] == 0.0


def test_average_precision_basic():
    scores = np.array([0.9, 0.8, 0.7])
    tp = np.array([True, False, True])
    ap = _average_precision(scores, tp, num_gt=2)
    # precision envelope: recall .5 @ p 1.0; recall 1.0 @ p 2/3.
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    np.testing.assert_allclose(ap, want, atol=1e-6)
