"""Inference API tests (CPU, pallas off): Detector structure, pixel mapping,
evaluate_model mechanism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import (
    AssignConfig, Config, DataConfig, ModelConfig, NMSConfig)
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.eval_coco import evaluate_model
from retinanet_tpu.infer import Detector, make_inference_fn
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.ops.anchors import build_levels


def _config(size=64):
    return Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(image_size=size, batch_size=2),
        assign=AssignConfig(max_boxes=8),
        nms=NMSConfig(use_pallas=False, top_k_per_level=50,
                      pre_nms_top_k=100, max_output_size=20,
                      score_threshold=0.3),
    )


def _detector(cfg):
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, levels.num_anchors, 3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), training=False)["params"]
    return Detector(cfg, params, ["square", "triangle", "circle"],
                    use_pallas=False)


def test_inference_fn_output_structure():
    cfg = _config()
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, levels.num_anchors, 3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), training=False)["params"]
    fn = make_inference_fn(model, levels, cfg, use_pallas=False)
    out = fn(params, jnp.zeros((2, 64, 64, 3)))
    assert out.boxes.shape == (2, 20, 4)
    assert out.scores.shape == (2, 20)
    assert out.class_ids.shape == (2, 20)
    assert out.valid.shape == (2, 20)
    # Untrained π=0.01 prior → no detections above 0.3.
    assert not bool(np.asarray(out.valid).any())


def test_detector_detect_pixel_mapping():
    cfg = _config()
    det = _detector(cfg)
    images = np.zeros((2, 64, 64, 3), np.float32)
    scales = np.array([0.5, 1.0], np.float32)
    results = det.detect(images, scales=scales)
    assert len(results) == 2
    for r in results:
        assert set(r.keys()) == {"boxes", "scores", "class_ids"}
        assert r["boxes"].shape[-1] == 4 if r["boxes"].size else True


def test_evaluate_model_mechanism():
    """Full evaluate pipeline on an untrained model: runs, returns ~0 mAP."""
    cfg = _config()
    det = _detector(cfg)
    loader = Shapes(None, 5, (64, 64))  # 5 images @ batch 2: partial batch
    metrics = evaluate_model(det, loader, cfg)
    for key in ("mAP", "AP50", "AP75", "mAP_small", "mAP_medium",
                "mAP_large", "AR@1", "AR@10", "AR@100"):
        assert key in metrics, key
    assert metrics["mAP"] == 0.0  # untrained prior fires nothing


def test_benchmark_runs_on_cpu():
    from retinanet_tpu.infer import benchmark
    cfg = _config()
    out = benchmark(cfg, batch_size=1, steps=1, warmup=0, num_classes=3)
    assert out["images_per_sec"] > 0
    assert out["image_size"] == 64


def test_detect_rect_canvas_pixel_scaling():
    """detect() scales normalized boxes by the ACTUAL batch canvas (H, W),
    not config.data.image_size (round-2 advisor finding: non-square bucket
    canvases returned wrong pixel coordinates)."""
    cfg = dataclasses.replace(
        _config(), nms=dataclasses.replace(_config().nms,
                                           score_threshold=0.0))
    det = _detector(cfg)
    h, w = 64, 96  # non-square, != config image_size on the W axis
    images = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
    raw = jax.device_get(det(images))
    results = det.detect(images)
    valid = raw.valid[0]
    assert valid.any()  # threshold 0 → top-k all valid
    expect = raw.boxes[0][valid] * np.array([h, w, h, w], np.float32)
    np.testing.assert_allclose(results[0]["boxes"], expect, rtol=1e-6)
    # Pixel coords live inside the canvas (sanity on the axis order).
    assert results[0]["boxes"][:, 0].max() <= h + 1e-3
    assert results[0]["boxes"][:, 1].max() <= w + 1e-3


def test_evaluate_model_buckets_match_square():
    """Bucketed eval == square eval when every sample picks the square
    bucket; rectangular loaders exercise per-bucket batches with no samples
    dropped (VERDICT r2 #4)."""
    cfg = _config()
    det = _detector(cfg)
    loader = Shapes(None, 5, (64, 64))
    square = evaluate_model(det, loader, cfg)

    bcfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      buckets=((64, 64), (32, 64))))
    bucketed = evaluate_model(det, loader, bcfg)
    # Square shapes images all pick the (64, 64) bucket → identical metrics
    # (nan-safe comparison: an all-nan area bucket is equal to itself).
    assert set(bucketed) == set(square)
    for k in square:
        np.testing.assert_equal(bucketed[k], square[k])


def test_evaluate_model_rect_buckets_no_drop():
    """Samples split across buckets: all are evaluated, including partial
    per-bucket batches (the training pipeline drops remainders; eval must
    not)."""
    import retinanet_tpu.eval_coco as ec

    cfg = _config()
    det = _detector(cfg)

    class RectLoader:
        class_names = ["square", "triangle", "circle"]
        num_classes = 3

        def __iter__(self):
            rng = np.random.RandomState(0)
            for i in range(5):
                h, w = (48, 96) if i % 2 else (96, 48)  # 3 tall, 2 wide
                yield {
                    "image": (rng.rand(h, w, 3) * 255).astype(np.uint8),
                    "boxes": np.array([[4.0, 4.0, 20.0, 20.0]], np.float32),
                    "class_ids": np.array([0], np.int32),
                }

    bcfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      buckets=((32, 64), (64, 32))))
    calls = []
    orig_add = ec.COCOEvaluator.add

    def counting_add(self, det_d, gt_d):
        calls.append(1)
        return orig_add(self, det_d, gt_d)

    ec.COCOEvaluator.add = counting_add
    try:
        metrics = evaluate_model(det, RectLoader(), bcfg)
    finally:
        ec.COCOEvaluator.add = orig_add
    assert len(calls) == 5  # every sample matched into the evaluator
    assert "mAP" in metrics


def test_evaluate_model_detections_sink():
    """detections_sink receives one (gt, det) call per image, with running-
    index image ids for loaders without native ids — the hook behind
    ``evaluate --dump-detections`` (offline pycocotools cross-validation)."""
    cfg = _config()
    # Zero decode threshold: even the untrained prior (sigmoid ~0.01)
    # yields detections, so the sink sees nonempty boxes.
    cfg = dataclasses.replace(
        cfg, nms=dataclasses.replace(cfg.nms, score_threshold=0.0))
    det = _detector(cfg)
    loader = Shapes(None, 3, (64, 64))
    calls = []
    evaluate_model(det, loader, cfg,
                   detections_sink=lambda gt, d: calls.append((gt, d)))
    assert len(calls) == 3
    assert sorted(gt["image_id"] for gt, _ in calls) == [0, 1, 2]
    for gt, d in calls:
        assert {"boxes", "scores", "class_ids"} <= set(d)
        assert d["boxes"].shape[0] == d["scores"].shape[0]
        assert d["boxes"].shape[0] > 0  # threshold 0 keeps candidates
