"""Independent cross-validation of ``eval_coco.COCOEvaluator``.

``eval_coco`` is the single source of every reported mAP, and pycocotools is
not installable here — so this file carries a second, *independent*
implementation: a straight transliteration of pycocotools ``cocoeval.py``'s
``evaluateImg`` + ``accumulate`` + ``summarize`` (bbox, useCats=1), written
in the original's own shape — per-image T×G/T×D match matrices, gt/dt id
bookkeeping, pooled mergesort accumulate — with none of the streaming
evaluator's restructurings (no prefix-slice trick, no pooled-dict layout).

The property tests then drive both implementations over randomized fixture
sweeps (score ties, IoU ties, crowds, area ranges, maxDets truncation) and
require agreement to 1e-9 on every summary metric.
"""

import numpy as np
import pytest

from retinanet_tpu.eval_coco import (
    AREA_RANGES, IOU_THRESHOLDS, RECALL_POINTS, COCOEvaluator)

T = len(IOU_THRESHOLDS)
MAX_DETS = (1, 10, 100)


# ---------------------------------------------------------------------------
# Reference implementation: cocoeval.py transliteration (bbox, useCats=1).
# GT/DT records are dicts like pycocotools': gt = {id, bbox(tlbr), area,
# iscrowd, ignore}; dt = {id, bbox, score, area}.
# ---------------------------------------------------------------------------

def _iou_bbox(dts, gts, iscrowd):
    """maskUtils.iou for tlbr boxes: crowd columns use inter/area(dt)."""
    out = np.zeros((len(dts), len(gts)))
    for d, db in enumerate(dts):
        dt_, dl, dbm, dr = db
        d_area = max(dbm - dt_, 0) * max(dr - dl, 0)
        for g, gb in enumerate(gts):
            gt_, gl, gbm, gr = gb
            g_area = max(gbm - gt_, 0) * max(gr - gl, 0)
            it = max(dt_, gt_)
            il = max(dl, gl)
            ib = min(dbm, gbm)
            ir = min(dr, gr)
            inter = max(ib - it, 0) * max(ir - il, 0)
            union = d_area if iscrowd[g] else d_area + g_area - inter
            out[d, g] = inter / union if union > 0 else 0.0
    return out


def _evaluate_img(gts, dts, a_rng, max_det, ious):
    """cocoeval.py evaluateImg — returns the evalImgs record."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0]
                             or g["area"] > a_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g["iscrowd"]) for g in gts]
    ious = ious[:, gtind][:len(dts)] if ious.size else ious

    G, D = len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if ious.size:
        for tind, t in enumerate(IOU_THRESHOLDS):
            for dind, d in enumerate(dts):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gts[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dts])
    a = a.reshape((1, len(dts)))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtIds": [d["id"] for d in dts],
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def coco_eval_reference(images, num_classes):
    """cocoeval evaluate() + accumulate() + summarize() over in-memory
    images.  ``images``: list of (dets, gts) where dets = {boxes, scores,
    class_ids} and gts = {boxes, class_ids, iscrowd?, areas?} — the same
    dicts COCOEvaluator.add takes."""
    area_names = list(AREA_RANGES)
    K, A, M = num_classes, len(area_names), len(MAX_DETS)
    R = len(RECALL_POINTS)

    # _prepare: per (image, category) gt/dt record lists with unique ids.
    next_id = [1]

    def make_records(img_i, cat):
        dets, gts = images[img_i]
        g_recs, d_recs = [], []
        gb = np.asarray(gts["boxes"], float).reshape(-1, 4)
        gc = np.asarray(gts["class_ids"])
        crowd = (np.asarray(gts["iscrowd"], bool)
                 if gts.get("iscrowd") is not None
                 else np.zeros(len(gb), bool))
        areas = (np.asarray(gts["areas"], float)
                 if gts.get("areas") is not None
                 else (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]))
        for i in range(len(gb)):
            if gc[i] != cat:
                continue
            g_recs.append({"id": next_id[0], "bbox": gb[i], "area": areas[i],
                           "iscrowd": bool(crowd[i]),
                           "ignore": bool(crowd[i])})
            next_id[0] += 1
        db = np.asarray(dets["boxes"], float).reshape(-1, 4)
        ds = np.asarray(dets["scores"], float)
        dc = np.asarray(dets["class_ids"])
        for i in range(len(db)):
            if dc[i] != cat:
                continue
            d_recs.append({
                "id": next_id[0], "bbox": db[i], "score": float(ds[i]),
                "area": ((db[i, 2] - db[i, 0]) * (db[i, 3] - db[i, 1]))})
            next_id[0] += 1
        return g_recs, d_recs

    # evaluate(): computeIoU at maxDets[-1], evaluateImg per (img, cat,
    # area); maxDet = maxDets[-1], accumulate prefix-slices the rest.
    eval_imgs = {}  # (cat, area_idx, img) -> record
    for cat in range(K):
        for img_i in range(len(images)):
            g_recs, d_recs = make_records(img_i, cat)
            dtind = np.argsort([-d["score"] for d in d_recs],
                               kind="mergesort")
            d_sorted = [d_recs[i] for i in dtind[:MAX_DETS[-1]]]
            ious = _iou_bbox([d["bbox"] for d in d_sorted],
                             [g["bbox"] for g in g_recs],
                             [int(g["iscrowd"]) for g in g_recs])
            for a_idx, a_name in enumerate(area_names):
                # evaluateImg re-sorts internally; hand it fresh copies.
                eval_imgs[(cat, a_idx, img_i)] = _evaluate_img(
                    [dict(g) for g in g_recs], [dict(d) for d in d_recs],
                    AREA_RANGES[a_name], MAX_DETS[-1], ious.copy())

    # accumulate()
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for a in range(A):
            recs = [eval_imgs[(k, a, i)] for i in range(len(images))]
            recs = [e for e in recs if e is not None]
            for m, max_det in enumerate(MAX_DETS):
                if not recs:
                    continue
                dt_scores = np.concatenate(
                    [e["dtScores"][:max_det] for e in recs])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in recs],
                    axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in recs],
                    axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in recs])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, RECALL_POINTS, side="left")
                    for ri, pi in enumerate(inds_r):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = q

    # summarize()
    def _s(ap, iou_thr=None, area="all", max_det=100):
        a = area_names.index(area)
        m = MAX_DETS.index(max_det)
        if ap:
            s = precision[:, :, :, a, m]
            if iou_thr is not None:
                s = s[[np.where(np.isclose(IOU_THRESHOLDS, iou_thr))[0][0]]]
        else:
            s = recall[:, :, a, m]
            if iou_thr is not None:
                s = s[[np.where(np.isclose(IOU_THRESHOLDS, iou_thr))[0][0]]]
        valid = s[s > -1]
        return -1.0 if valid.size == 0 else float(np.mean(valid))

    out = {
        "mAP": _s(True),
        "AP50": _s(True, 0.5),
        "AP75": _s(True, 0.75),
        "mAP_small": _s(True, area="small"),
        "mAP_medium": _s(True, area="medium"),
        "mAP_large": _s(True, area="large"),
    }
    for md in MAX_DETS:
        out[f"AR@{md}"] = _s(False, max_det=md)
    return out


# ---------------------------------------------------------------------------
# Fixture generation + agreement harness
# ---------------------------------------------------------------------------

def _compare(images, num_classes):
    ev = COCOEvaluator(num_classes)
    for dets, gts in images:
        ev.add(dets, gts)
    ours = ev.summarize()
    ref = coco_eval_reference(images, num_classes)
    for key, ref_v in ref.items():
        our_v = ours[key]
        if ref_v == -1.0:
            assert np.isnan(our_v), (key, our_v)
        else:
            assert abs(our_v - ref_v) < 1e-9, (key, our_v, ref_v)


def _random_images(rng, n_images, num_classes, crowd_prob=0.15,
                   quantize=8, max_gt=6, max_det=12, with_areas=False):
    """Random fixtures engineered for collisions: coordinates on a coarse
    grid (IoU ties), scores from a small discrete set (score ties), sizes
    spanning the small/medium/large area brackets, optional crowds and
    annotation-area overrides."""
    images = []
    score_pool = rng.uniform(0, 1, size=7)  # few distinct values → ties
    for _ in range(n_images):
        n_gt = rng.randint(0, max_gt + 1)
        n_dt = rng.randint(0, max_det + 1)

        def boxes(n):
            tl = rng.randint(0, quantize, size=(n, 2)) * 30.0
            # Mix of sizes crossing the 32²/96² area thresholds.
            wh = rng.choice([15.0, 30.0, 60.0, 120.0], size=(n, 2))
            return np.concatenate([tl, tl + wh], axis=1)

        gb = boxes(n_gt)
        gts = {"boxes": gb,
               "class_ids": rng.randint(0, num_classes, size=n_gt),
               "iscrowd": rng.rand(n_gt) < crowd_prob}
        if with_areas and n_gt:
            # Segmentation area ≠ bbox area (e.g. non-rectangular masks).
            bbox_area = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
            gts["areas"] = bbox_area * rng.uniform(0.4, 1.0, size=n_gt)
        dets = {"boxes": boxes(n_dt),
                "scores": rng.choice(score_pool, size=n_dt),
                "class_ids": rng.randint(0, num_classes, size=n_dt)}
        images.append((dets, gts))
    return images


@pytest.mark.parametrize("seed", range(8))
def test_agreement_random_sweep(seed):
    """150 random images per seed (1200 total across the sweep), ties,
    crowds, area ranges, maxDets truncation — both implementations agree to
    1e-9 on every summary metric."""
    rng = np.random.RandomState(seed)
    images = _random_images(rng, 150, num_classes=3 + seed % 3,
                            with_areas=seed % 2 == 0)
    _compare(images, 3 + seed % 3)


def test_agreement_no_crowds_high_detcount():
    """maxDets truncation actually bites (dets ≫ 100 per class)."""
    rng = np.random.RandomState(99)
    images = []
    for _ in range(5):
        dets, gts = _random_images(rng, 1, 1, crowd_prob=0.0, max_gt=6,
                                   max_det=0)[0]
        n = 140
        tl = rng.randint(0, 8, size=(n, 2)) * 30.0
        wh = rng.choice([30.0, 60.0], size=(n, 2))
        dets = {"boxes": np.concatenate([tl, tl + wh], 1),
                "scores": rng.choice(np.linspace(0.1, 0.9, 5), size=n),
                "class_ids": np.zeros(n, int)}
        images.append((dets, gts))
    _compare(images, 1)


def test_agreement_all_crowd_image():
    """Images whose GT is 100% crowd: zero recall denominator, detections
    absorbed (ignored), never FPs."""
    rng = np.random.RandomState(7)
    images = _random_images(rng, 40, 2, crowd_prob=1.0)
    _compare(images, 2)


# ---------------------------------------------------------------------------
# Directed crowd-semantics cases (hand-checkable)
# ---------------------------------------------------------------------------

def _single(dets, gts, num_classes=1):
    ev = COCOEvaluator(num_classes)
    ev.add(dets, gts)
    return ev.summarize()


def test_crowd_absorbs_multiple_detections():
    """Two detections inside one crowd region: both ignored (not FPs), and
    a clean TP elsewhere still yields AP 1.0."""
    gts = {"boxes": np.array([[0, 0, 100, 100], [200, 200, 260, 260]],
                             np.float32),
           "class_ids": np.array([0, 0]),
           "iscrowd": np.array([True, False])}
    dets = {"boxes": np.array([[10, 10, 40, 40], [50, 50, 90, 90],
                               [200, 200, 260, 260]], np.float32),
            "scores": np.array([0.9, 0.8, 0.7], np.float32),
            "class_ids": np.array([0, 0, 0])}
    out = _single(dets, gts)
    # Both crowd-contained dets have IoF 1.0 ≥ every threshold → ignored at
    # all thresholds; the exact match is a TP at all thresholds.
    assert out["mAP"] == pytest.approx(1.0)
    assert out["AR@100"] == pytest.approx(1.0)


def test_crowd_dets_would_be_fps_without_crowd_flag():
    """Same geometry, crowd flag off: the two region dets become FPs ranked
    above the TP, dragging AP down — proves the flag changes the result."""
    gts = {"boxes": np.array([[0, 0, 100, 100], [200, 200, 260, 260]],
                             np.float32),
           "class_ids": np.array([0, 0])}
    dets = {"boxes": np.array([[10, 10, 40, 40], [50, 50, 90, 90],
                               [200, 200, 260, 260]], np.float32),
            "scores": np.array([0.9, 0.8, 0.7], np.float32),
            "class_ids": np.array([0, 0, 0])}
    out = _single(dets, gts)
    assert out["mAP"] < 0.5  # ranked FPs above the only TPs


def test_crowd_not_counted_in_recall():
    """A crowd GT with no detections does not hurt recall/AP."""
    gts = {"boxes": np.array([[0, 0, 100, 100], [200, 200, 260, 260]],
                             np.float32),
           "class_ids": np.array([0, 0]),
           "iscrowd": np.array([True, False])}
    dets = {"boxes": np.array([[200, 200, 260, 260]], np.float32),
            "scores": np.array([0.9], np.float32),
            "class_ids": np.array([0])}
    out = _single(dets, gts)
    assert out["mAP"] == pytest.approx(1.0)
    assert out["AR@100"] == pytest.approx(1.0)


def test_non_crowd_preferred_over_crowd():
    """A detection overlapping both a real GT (IoU ≥ thr) and a crowd with
    higher IoF still matches the real GT: the scan breaks before ignored
    GTs once a real match exists."""
    gts = {"boxes": np.array([[0, 0, 100, 100], [0, 0, 64, 64]],
                             np.float32),
           "class_ids": np.array([0, 0]),
           "iscrowd": np.array([True, False])}
    # Det inside the crowd (IoF 1.0) with IoU 0.64 vs the real GT.
    dets = {"boxes": np.array([[0, 0, 52, 64]], np.float32),
            "scores": np.array([0.9], np.float32),
            "class_ids": np.array([0])}
    out = _single(dets, gts)
    # At thresholds ≤ 0.8125 (IoU = 52·64/(64·64) = 0.8125) it's a TP on the
    # real GT; above that it matches the crowd and is ignored — never an FP.
    # 7 of 10 thresholds are TPs → mAP = AR = 0.7 exactly.
    assert out["AP50"] == pytest.approx(1.0)
    assert out["mAP"] == pytest.approx(0.7)
    assert out["AR@100"] == pytest.approx(0.7)


def test_annotation_area_overrides_bbox_area():
    """gt['areas'] (segmentation area) drives the area-range ignores, not
    the bbox area: a 40×40 bbox (1600 px² = 'medium') with annotation area
    900 px² counts as 'small'."""
    gts = {"boxes": np.array([[0, 0, 40, 40]], np.float32),
           "class_ids": np.array([0]),
           "areas": np.array([900.0], np.float32)}
    dets = {"boxes": np.array([[0, 0, 40, 40]], np.float32),
            "scores": np.array([0.9], np.float32),
            "class_ids": np.array([0])}
    out = _single(dets, gts)
    assert out["mAP_small"] == pytest.approx(1.0)
    assert np.isnan(out["mAP_medium"])
