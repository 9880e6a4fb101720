"""Pascal VOC evaluation protocol (retinanet_tpu/eval_voc.py): matcher
semantics (argmax GT, matched-GT -> FP, difficult ignores) and both AP
formulas against hand-computed values."""

import numpy as np
import pytest

from retinanet_tpu.eval_voc import (VOCEvaluator, _match_image_voc,
                                    evaluate_detections_voc, voc_ap)


def _box(t, l, s=10.0):
    return [t, l, t + s, l + s]


def test_voc_ap_formulas_hand_computed():
    # One class, 2 GT. Detections (score-desc): TP, FP, TP.
    # PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3).
    recall = np.array([0.5, 0.5, 1.0])
    precision = np.array([1.0, 0.5, 2 / 3])
    # VOC07 11-point: max precision at r>=0..0.5 is 1.0 (6 pts),
    # at r>=0.6..1.0 is 2/3 (5 pts) -> (6*1 + 5*2/3)/11.
    np.testing.assert_allclose(voc_ap(recall, precision, True),
                               (6 * 1.0 + 5 * 2 / 3) / 11, atol=1e-9)
    # VOC12 continuous: envelope is 1.0 on (0,.5], 2/3 on (.5,1].
    np.testing.assert_allclose(voc_ap(recall, precision, False),
                               0.5 * 1.0 + 0.5 * 2 / 3, atol=1e-9)


def test_voc_matcher_matched_gt_is_fp():
    """The VOC-vs-COCO protocol difference: a detection whose argmax GT is
    taken is a FP even though another GT clears the threshold."""
    gt = np.array([_box(0, 0), _box(0, 5)], np.float32)  # overlapping pair
    # det1 overlaps GT0 at 0.667 (argmax) and GT1 at 0.538 — BOTH clear
    # 0.5, but GT0 is taken by det0, and VOC does not fall through to the
    # runner-up GT the way COCO's greedy matcher does.
    det = np.array([_box(0, 0), _box(0, 2)], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    s, tp, ig = _match_image_voc(det, scores, gt,
                                 np.zeros(2, bool), 0.5)
    assert tp.tolist() == [True, False]  # det1: argmax GT0 used -> FP
    assert not ig.any()


def test_voc_matcher_difficult_neither_tp_nor_fp():
    gt = np.array([_box(0, 0)], np.float32)
    det = np.array([_box(0, 0), _box(50, 50)], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    s, tp, ig = _match_image_voc(det, scores, gt, np.array([True]), 0.5)
    assert tp.tolist() == [False, False]
    assert ig.tolist() == [True, False]  # miss far from any GT stays FP


def test_voc_evaluator_end_to_end():
    dets = [
        {"boxes": np.array([_box(0, 0), _box(100, 100), _box(0, 40)],
                           np.float32),
         "scores": np.array([0.9, 0.8, 0.7], np.float32),
         "class_ids": np.array([0, 0, 0])},
        {"boxes": np.array([_box(20, 20)], np.float32),
         "scores": np.array([0.6], np.float32),
         "class_ids": np.array([0])},
    ]
    gts = [
        # difficult GT at (0,40): the 0.7 det matching it is ignored.
        {"boxes": np.array([_box(0, 0), _box(0, 40)], np.float32),
         "class_ids": np.array([0, 0]),
         "difficult": np.array([False, True])},
        {"boxes": np.array([_box(20, 20)], np.float32),
         "class_ids": np.array([0]),
         "difficult": None},
    ]
    m = evaluate_detections_voc(dets, gts, num_classes=1)
    # Pooled (non-ignored) by score: .9 TP, .8 FP, .6 TP; num_gt=2.
    # PR: (.5,1), (.5,.5), (1,2/3).
    np.testing.assert_allclose(m["mAP_voc07"], (6 + 5 * 2 / 3) / 11,
                               atol=1e-9)
    np.testing.assert_allclose(m["mAP_voc12"], 0.5 + 0.5 * 2 / 3,
                               atol=1e-9)


def test_voc_evaluator_no_gt_class_is_nan_excluded():
    ev = VOCEvaluator(num_classes=2)
    ev.add({"boxes": np.array([_box(0, 0)], np.float32),
            "scores": np.array([0.9], np.float32),
            "class_ids": np.array([0])},
           {"boxes": np.array([_box(0, 0)], np.float32),
            "class_ids": np.array([0]), "difficult": None})
    m = ev.summarize()  # class 1 has no GT anywhere -> excluded from mean
    np.testing.assert_allclose(m["mAP_voc07"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["mAP_voc12"], 1.0, atol=1e-9)


def test_voc_perfect_detector_is_one():
    rng = np.random.RandomState(0)
    dets, gts = [], []
    for _ in range(20):
        n = rng.randint(1, 5)
        boxes = np.stack([np.array(_box(rng.uniform(0, 200),
                                        rng.uniform(0, 200),
                                        rng.uniform(8, 30)))
                          for _ in range(n)]).astype(np.float32)
        cls = rng.randint(0, 3, n)
        gts.append({"boxes": boxes, "class_ids": cls, "difficult": None})
        dets.append({"boxes": boxes, "scores": rng.uniform(0.5, 1.0, n)
                     .astype(np.float32), "class_ids": cls})
    m = evaluate_detections_voc(dets, gts, num_classes=3)
    np.testing.assert_allclose(m["mAP_voc07"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["mAP_voc12"], 1.0, atol=1e-9)
