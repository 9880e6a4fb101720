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
    ig = np.zeros(3, bool)
    ap, ar = _average_precision(scores, tp, ig, num_gt=2)
    # precision envelope: recall .5 @ p 1.0; recall 1.0 @ p 2/3.
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    np.testing.assert_allclose(ap, want, atol=1e-6)
    assert ar == 1.0


# ---------------------------------------------------------------------------
# pycocotools-protocol goldens: each case is a hand trace of COCOeval's
# evaluateImg/accumulate (cocoeval.py) — maxDets truncation, equal-IoU tie
# semantics, area-range ignores, AR.
# ---------------------------------------------------------------------------

def test_max_dets_truncation_per_image_per_category():
    # 101 detections on one image, one category: the single TP is ranked
    # 101st by score, so maxDets=100 (per image per category, COCOeval
    # evaluateImg dt[0:maxDet]) drops it → AP 0.  Without truncation AP>0.
    from retinanet_tpu.eval_coco import COCOEvaluator
    n_fp = 100
    fp_boxes = np.stack([
        np.array([50 + 20 * i, 50, 60 + 20 * i, 60], np.float32)
        for i in range(n_fp)])
    boxes = np.concatenate([fp_boxes, [[0, 0, 10, 10]]]).astype(np.float32)
    scores = np.concatenate([np.linspace(0.9, 0.5, n_fp), [0.1]])
    gts = {"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "class_ids": np.array([0])}
    dets = {"boxes": boxes, "class_ids": np.zeros(n_fp + 1, int),
            "scores": scores}
    ev = COCOEvaluator(num_classes=1)
    ev.add(dets, gts)
    out = ev.summarize()
    assert out["mAP"] == 0.0
    assert out["AR@100"] == 0.0
    # Sanity: maxDets=1000 would keep it.
    ev2 = COCOEvaluator(num_classes=1, max_dets=(1, 10, 1000))
    ev2.add(dets, gts)
    assert ev2.summarize()["mAP"] > 0.0


def test_equal_iou_tie_goes_to_later_gt():
    # Two GTs with *identical* IoU to the first detection.  COCOeval's
    # strict `<` scan updates the match on equality → detection 1 takes the
    # LATER GT; detection 2 (exactly on GT1) then matches GT1 → both TP.
    # (First-max matching would also yield 2 TP here unless det2 overlaps
    # only the second GT — so construct det2 to only match GT2.)
    gt_boxes = np.array([[0, 0, 10, 10], [10, 0, 20, 10]], np.float32)
    # det1 straddles both GTs equally: [2.5,0,17.5,10] → inter 7.5×10 with
    # each; IoU = 75/(100+150-75) = 75/175 each.
    det_boxes = np.array([[2.5, 0, 17.5, 10],   # ties GT1/GT2 → takes GT2
                          [10, 0, 20, 10]],     # exactly GT2
                         np.float32)
    dets = {"boxes": det_boxes, "class_ids": np.zeros(2, int),
            "scores": np.array([0.9, 0.8])}
    gts = {"boxes": gt_boxes, "class_ids": np.zeros(2, int)}
    out = evaluate_detections([dets], [gts], num_classes=1)
    # At IoU .50 threshold only: det1 IoU 3/7 < .5 → unmatched FP;
    # det2 matches GT2 (still free ONLY if det1 took nothing at .5).
    # Trace at t=.5: det1 best IoU 3/7 <.5 → FP; det2 IoU 1.0 with GT2 → TP.
    # recall .5, precision path: [0/1, 1/2] → envelope p=.5 up to recall .5.
    np.testing.assert_allclose(out["AP50"], 51 * 0.5 / 101, atol=1e-6)


def test_area_range_metrics():
    # One small GT (8×8=64 < 32²) and one large GT (100×100=1e4 > 96²),
    # both detected perfectly → mAP_small and mAP_large are 1, medium nan.
    gts = {"boxes": np.array([[0, 0, 8, 8], [200, 200, 300, 300]],
                             np.float32),
           "class_ids": np.array([0, 0])}
    dets = {"boxes": gts["boxes"].copy(), "class_ids": np.array([0, 0]),
            "scores": np.array([0.9, 0.8])}
    out = evaluate_detections([dets], [gts], num_classes=1)
    assert out["mAP"] == 1.0
    assert out["mAP_small"] == 1.0
    assert out["mAP_large"] == 1.0
    assert np.isnan(out["mAP_medium"])


def test_area_range_ignores_out_of_range_fp():
    # COCOeval: an unmatched detection whose area is outside the range is
    # *ignored* for that range, not an FP.  Small-range eval of a large
    # spurious detection must still give mAP_small 1.0.
    gts = {"boxes": np.array([[0, 0, 8, 8]], np.float32),
           "class_ids": np.array([0])}
    dets = {"boxes": np.array([[0, 0, 8, 8], [50, 50, 160, 160]],
                              np.float32),
            "class_ids": np.array([0, 0]),
            "scores": np.array([0.8, 0.9])}  # large FP ranked FIRST
    out = evaluate_detections([dets], [gts], num_classes=1)
    assert out["mAP_small"] == 1.0   # large FP ignored in small range
    assert out["mAP"] < 1.0          # but counted in 'all'


def test_ar_at_1_vs_10():
    # 3 GT, 3 perfect detections → AR@1 limited to 1/3 recall; AR@10 = 1.
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]],
                     np.float32)
    gts = {"boxes": boxes, "class_ids": np.zeros(3, int)}
    dets = {"boxes": boxes.copy(), "class_ids": np.zeros(3, int),
            "scores": np.array([0.9, 0.8, 0.7])}
    out = evaluate_detections([dets], [gts], num_classes=1)
    np.testing.assert_allclose(out["AR@1"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(out["AR@10"], 1.0, atol=1e-6)


def test_score_tie_stable_order():
    # Two detections with equal scores: stable mergesort keeps insertion
    # order (COCOeval kind='mergesort').  First is an FP, second a TP →
    # precision at recall 1.0 is 1/2.
    gts = {"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "class_ids": np.array([0])}
    dets = {"boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]],
                              np.float32),
            "class_ids": np.array([0, 0]),
            "scores": np.array([0.9, 0.9])}
    out = evaluate_detections([dets], [gts], num_classes=1)
    np.testing.assert_allclose(out["AP50"], 0.5, atol=1e-6)


def test_streaming_matches_batch():
    # COCOEvaluator fed image-by-image == evaluate_detections on the list.
    from retinanet_tpu.eval_coco import COCOEvaluator
    rng = np.random.RandomState(0)
    dets, gts = [], []
    for _ in range(6):
        n_gt = rng.randint(1, 5)
        gb = rng.uniform(0, 50, (n_gt, 2))
        gt_boxes = np.concatenate([gb, gb + rng.uniform(5, 30, (n_gt, 2))],
                                  -1).astype(np.float32)
        gts.append({"boxes": gt_boxes,
                    "class_ids": rng.randint(0, 3, n_gt)})
        n_det = rng.randint(0, 7)
        db = rng.uniform(0, 50, (n_det, 2))
        det_boxes = np.concatenate([db, db + rng.uniform(5, 30, (n_det, 2))],
                                   -1).astype(np.float32)
        dets.append({"boxes": det_boxes,
                     "class_ids": rng.randint(0, 3, n_det),
                     "scores": rng.uniform(0, 1, n_det)})
    batch = evaluate_detections(dets, gts, num_classes=3)
    ev = COCOEvaluator(num_classes=3)
    for d, g in zip(dets, gts):
        ev.add(d, g)
    stream = ev.summarize()
    for k in batch:
        np.testing.assert_allclose(batch[k], stream[k], atol=1e-9,
                                   err_msg=k)
