"""COCO-style mAP evaluation — a capability the reference entirely lacks
(its ``model_fn`` is TRAIN-only, ``/root/reference/train.py:207``), but the
north-star target demands mAP parity measurement (BASELINE.md).

Self-contained numpy implementation of the COCO detection metric protocol
(pycocotools is not available in this environment):
  * per-class, per-image greedy matching of score-sorted detections to GT at
    a given IoU threshold (each GT matched at most once)
  * 101-point interpolated precision (recall thresholds 0:.01:1)
  * AP averaged over IoU thresholds .50:.05:.95 (plus AP50 / AP75), mean
    over classes present in the ground truth

Validated in tests against hand-computable cases (single box, perfect
detections → AP 1.0; known precision/recall staircases).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] × [M,4] (t,l,b,r) → [N,M] IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    t = np.maximum(a[:, None, 0], b[None, :, 0])
    l = np.maximum(a[:, None, 1], b[None, :, 1])
    bb = np.minimum(a[:, None, 2], b[None, :, 2])
    r = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(bb - t, 0, None) * np.clip(r - l, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(det_boxes, det_scores, gt_boxes, iou_threshold):
    """Greedy match score-sorted detections to GT; returns tp flags aligned
    with the detections in descending-score order.

    COCO semantics: each detection takes the highest-IoU still-unmatched GT
    with IoU ≥ threshold (ties to the earlier GT)."""
    order = np.argsort(-det_scores, kind="stable")
    iou = _box_iou_matrix(det_boxes[order], gt_boxes)
    gt_used = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(order), bool)
    for d in range(len(order)):
        row = np.where(gt_used, -1.0, iou[d])
        if row.size == 0:
            continue
        g = int(np.argmax(row))
        if row[g] >= iou_threshold:
            gt_used[g] = True
            tp[d] = True
    return tp, det_scores[order]


def _average_precision(scores, tp, num_gt):
    """101-point interpolated AP from pooled (score, tp) across images."""
    if num_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # Monotone non-increasing precision envelope.
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # Interpolate at the 101 recall points.
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    interp = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    return float(np.mean(interp))


def evaluate_detections(
    detections: Sequence[Dict],
    ground_truths: Sequence[Dict],
    num_classes: int,
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
) -> Dict[str, float]:
    """COCO-style AP over a dataset.

    ``detections[i]`` / ``ground_truths[i]``: dicts for image i with
    ``boxes`` [N,4] (t,l,b,r — any consistent unit), ``class_ids`` [N]; the
    detection dicts also carry ``scores`` [N].
    """
    assert len(detections) == len(ground_truths)
    ap_per_class_thr = np.full((num_classes, len(iou_thresholds)), np.nan)

    for c in range(num_classes):
        num_gt = 0
        pooled = {t: ([], []) for t in range(len(iou_thresholds))}
        for det, gt in zip(detections, ground_truths):
            det_sel = det["class_ids"] == c
            gt_sel = gt["class_ids"] == c
            det_boxes = np.asarray(det["boxes"], np.float32)[det_sel]
            det_scores = np.asarray(det["scores"], np.float32)[det_sel]
            gt_boxes = np.asarray(gt["boxes"], np.float32)[gt_sel]
            num_gt += len(gt_boxes)
            for t, thr in enumerate(iou_thresholds):
                tp, scores = _match_image(det_boxes, det_scores, gt_boxes,
                                          thr)
                pooled[t][0].append(scores)
                pooled[t][1].append(tp)
        if num_gt == 0:
            continue
        for t in range(len(iou_thresholds)):
            scores = np.concatenate(pooled[t][0]) if pooled[t][0] else \
                np.zeros(0)
            tp = np.concatenate(pooled[t][1]) if pooled[t][1] else \
                np.zeros(0, bool)
            ap_per_class_thr[c, t] = _average_precision(scores, tp, num_gt)

    with np.errstate(invalid="ignore"):
        per_thr = np.nanmean(ap_per_class_thr, axis=0)
    idx50 = int(np.argmin(np.abs(iou_thresholds - 0.5)))
    idx75 = int(np.argmin(np.abs(iou_thresholds - 0.75)))
    return {
        "mAP": float(np.nanmean(ap_per_class_thr)),
        "AP50": float(per_thr[idx50]),
        "AP75": float(per_thr[idx75]),
    }


def evaluate_model(detector, loader, config, max_images: int = None,
                   score_threshold: float = None) -> Dict[str, float]:
    """Run the detector over a loader and compute mAP.

    Detections are produced in canvas coordinates and mapped back to
    original-image pixels via the pipeline's scale factor.
    """
    from retinanet_tpu.data.pipeline import Pipeline
    import dataclasses

    data_cfg = dataclasses.replace(config.data, augment_flip=False)
    pipe = Pipeline(loader, data_cfg, max_boxes=config.assign.max_boxes,
                    training=False)

    all_dets: List[Dict] = []
    all_gts: List[Dict] = []
    count = 0
    samples = {i: s for i, s in enumerate(loader)}
    for batch in pipe.epoch(0):
        results = detector.detect(batch.images, scales=batch.scales)
        for i, det in enumerate(results):
            if max_images is not None and count >= max_images:
                break
            sample = samples[int(batch.image_ids[i])]
            if score_threshold is not None:
                keep = det["scores"] >= score_threshold
                det = {k: v[keep] for k, v in det.items()}
            all_dets.append(det)
            all_gts.append({"boxes": sample["boxes"],
                            "class_ids": sample["class_ids"]})
            count += 1
        if max_images is not None and count >= max_images:
            break
    return evaluate_detections(all_dets, all_gts, loader.num_classes)
