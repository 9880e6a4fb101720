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
