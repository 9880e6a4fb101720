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
    gt = np.array([_box(0, 0), _box(0, 4)], np.float32)  # overlapping pair
    # Inclusive (+1) IoU: det1 overlaps GT0 at 0.833 (argmax) and GT1 at
    # 0.571 — BOTH clear 0.5, but GT0 is taken by det0, and VOC does not
    # fall through to the runner-up GT the way COCO's greedy matcher does.
    det = np.array([_box(0, 0), _box(0, 1)], np.float32)
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


# ---------------------------------------------------------------------------
# Independent cross-validation: a straight transliteration of the official
# VOCdevkit/py-faster-rcnn ``voc_eval.py`` (global score sort across the
# dataset, per-image R['det'] bookkeeping, ovmax/jmax matching) — none of
# the streaming evaluator's restructurings.  Property tests drive both over
# randomized fixtures (overlaps, ties, difficult flags) and require 1e-9
# agreement on AP under both formulas.
# ---------------------------------------------------------------------------

def _voc_eval_reference(dets_by_image, gts_by_image, cls, iou_thr,
                        use_07_metric):
    """voc_eval for one class.  dets_by_image[i] = (boxes, scores, ids);
    gts_by_image[i] = (boxes, ids, difficult)."""
    class_recs = {}
    npos = 0
    for i, (gb, gc, gd) in enumerate(gts_by_image):
        sel = gc == cls
        bbox, difficult = gb[sel], gd[sel]
        npos += int((~difficult).sum())
        class_recs[i] = {"bbox": bbox, "difficult": difficult,
                         "det": np.zeros(len(bbox), bool)}

    image_ids, confidence, BB = [], [], []
    for i, (db, ds, dc) in enumerate(dets_by_image):
        sel = dc == cls
        for b, s in zip(db[sel], ds[sel]):
            image_ids.append(i)
            confidence.append(s)
            BB.append(b)
    if npos == 0:
        return np.nan
    if not BB:
        return 0.0
    confidence = np.asarray(confidence)
    BB = np.asarray(BB, np.float64)
    sorted_ind = np.argsort(-confidence, kind="stable")
    BB = BB[sorted_ind]
    image_ids = [image_ids[x] for x in sorted_ind]

    nd = len(image_ids)
    tp, fp = np.zeros(nd), np.zeros(nd)
    for d in range(nd):
        R = class_recs[image_ids[d]]
        bb = BB[d]
        ovmax, jmax = -np.inf, -1
        BBGT = R["bbox"].astype(np.float64)
        if BBGT.size > 0:
            iymin = np.maximum(BBGT[:, 0], bb[0])
            ixmin = np.maximum(BBGT[:, 1], bb[1])
            iymax = np.minimum(BBGT[:, 2], bb[2])
            ixmax = np.minimum(BBGT[:, 3], bb[3])
            ih = np.maximum(iymax - iymin + 1.0, 0.0)
            iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
            inters = iw * ih
            uni = ((bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                   + (BBGT[:, 2] - BBGT[:, 0] + 1.0)
                   * (BBGT[:, 3] - BBGT[:, 1] + 1.0)
                   - inters)
            overlaps = inters / uni
            ovmax = np.max(overlaps)
            jmax = int(np.argmax(overlaps))
        if ovmax > iou_thr:
            if not R["difficult"][jmax]:
                if not R["det"][jmax]:
                    tp[d] = 1.0
                    R["det"][jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(npos)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return voc_ap(rec, prec, use_07_metric)


@pytest.mark.parametrize("seed", range(8))
def test_voc_evaluator_matches_reference_transliteration(seed):
    rng = np.random.RandomState(seed)
    num_classes, num_images = 4, 12
    dets, gts = [], []
    dets_by_image, gts_by_image = [], []
    for _ in range(num_images):
        ng = rng.randint(0, 6)
        gb = np.zeros((ng, 4), np.float32)
        if ng:
            tl = rng.uniform(0, 150, (ng, 2))
            wh = rng.uniform(5, 60, (ng, 2))
            gb = np.concatenate([tl, tl + wh], -1).astype(np.float32)
        gc = rng.randint(0, num_classes, ng)
        gd = rng.rand(ng) < 0.25
        nd = rng.randint(0, 10)
        db = np.zeros((nd, 4), np.float32)
        if nd:
            if ng and rng.rand() < 0.7:
                # Perturbed copies of GT boxes → realistic overlaps/ties.
                src = gb[rng.randint(0, ng, nd)]
                db = (src + rng.uniform(-8, 8, (nd, 4))).astype(np.float32)
                db[:, 2:] = np.maximum(db[:, 2:], db[:, :2] + 1)
            else:
                tl = rng.uniform(0, 150, (nd, 2))
                wh = rng.uniform(5, 60, (nd, 2))
                db = np.concatenate([tl, tl + wh], -1).astype(np.float32)
        ds = rng.choice([0.3, 0.5, 0.7, 0.9], nd).astype(np.float32)  # ties
        dc = rng.randint(0, num_classes, nd)
        dets.append({"boxes": db, "scores": ds, "class_ids": dc})
        gts.append({"boxes": gb, "class_ids": gc, "difficult": gd})
        dets_by_image.append((db, ds, dc))
        gts_by_image.append((gb, gc, gd))

    mine = evaluate_detections_voc(dets, gts, num_classes)
    for key, use07 in (("mAP_voc07", True), ("mAP_voc12", False)):
        aps = [_voc_eval_reference(dets_by_image, gts_by_image, c, 0.5,
                                   use07) for c in range(num_classes)]
        ref = float(np.nanmean(aps))
        np.testing.assert_allclose(mine[key], ref, atol=1e-9, err_msg=key)


def test_per_class_ap_both_protocols():
    from retinanet_tpu.eval_coco import COCOEvaluator

    det = {"boxes": np.array([_box(0, 0)], np.float32),
           "scores": np.array([0.9], np.float32),
           "class_ids": np.array([0])}
    gt = {"boxes": np.array([_box(0, 0), _box(50, 50)], np.float32),
          "class_ids": np.array([0, 1]), "difficult": None}
    voc = VOCEvaluator(num_classes=3)
    voc.add(det, gt)
    ap = voc.per_class_ap()
    np.testing.assert_allclose(ap[0], 1.0)   # perfect
    np.testing.assert_allclose(ap[1], 0.0)   # missed GT
    assert np.isnan(ap[2])                   # no GT

    coco = COCOEvaluator(num_classes=3)
    coco.add(det, {**gt, "iscrowd": None, "areas": None})
    ap = coco.per_class_ap()
    np.testing.assert_allclose(ap[0], 1.0)
    np.testing.assert_allclose(ap[1], 0.0)
    assert np.isnan(ap[2])


def test_voc_inclusive_iou_convention():
    """The devkit's +1 pixel-inclusive IoU: GT (0,0,9,9) vs det
    (0,0,13,13) is 100/196 = 0.510 inclusive (TP) but 81/169 = 0.479
    continuous (would be FP) — the review-found deviation, pinned."""
    gt = np.array([[0, 0, 9, 9]], np.float32)
    det = np.array([[0, 0, 13, 13]], np.float32)
    s, tp, ig = _match_image_voc(det, np.array([0.9], np.float32), gt,
                                 np.zeros(1, bool), 0.5)
    assert tp.tolist() == [True]
