"""COCO-scale readiness drill (VERDICT r2 #4): a few hundred rectangular
JPEG images with crowds + 20 classes through the FULL path — loader →
bucketed pipeline → train steps → checkpoint → bucketed streaming eval —
plus a host-pipeline throughput measurement.  (The 1k-image TPU variant is
``_coco_drill.py``; this keeps the same machinery green on CPU.)"""

import dataclasses
import json
import time

import numpy as np
import pytest

from retinanet_tpu.config import (AssignConfig, Config, DataConfig,
                                  ModelConfig, NMSConfig, TrainConfig)
from retinanet_tpu.data.loaders.inferred import Inferred
from retinanet_tpu.data.pipeline import build_pipeline
from retinanet_tpu.data.synthetic_coco import generate


@pytest.fixture(scope="module")
def drill_dataset(tmp_path_factory):
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 needed for JPEG fixtures")
    out = tmp_path_factory.mktemp("coco_drill")
    # Small sizes for CPU; aspect mix matches the real-size pool.
    ann, imgs = generate(str(out), num_images=60, num_classes=20, seed=3,
                         sizes=((48, 64), (64, 48), (56, 56)),
                         crowd_prob=0.3, max_objects=4)
    return ann, imgs


def _cfg(tmp_path, ann, imgs):
    return Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=20,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(dataset=("coco", ann, imgs),
                        image_size=64, buckets=((48, 64), (64, 48), (64, 64)),
                        batch_size=4, shuffle_buffer=8, num_workers=4),
        assign=AssignConfig(max_boxes=8),
        nms=NMSConfig(use_pallas=False, top_k_per_level=20,
                      pre_nms_top_k=40, max_output_size=10,
                      score_threshold=0.05),
        train=TrainConfig(experiment=str(tmp_path / "exp"), epochs=1,
                          steps_per_epoch=2, checkpoint_every=2,
                          log_every=1, learning_rate=1e-3),
    )


def test_drill_loader_crowds_and_areas(drill_dataset):
    ann, imgs = drill_dataset
    train_loader = Inferred("coco", [ann, imgs])
    eval_loader = Inferred("coco", [ann, imgs], include_crowds=True)
    n_train_boxes = sum(len(s["boxes"]) for s in train_loader)
    eval_samples = list(eval_loader)
    n_eval_boxes = sum(len(s["boxes"]) for s in eval_samples)
    n_crowds = sum(int(s["iscrowd"].sum()) for s in eval_samples)
    assert n_crowds > 0  # crowd_prob 0.3 over 60 images
    assert n_eval_boxes == n_train_boxes + n_crowds
    # Segmentation areas flow through and differ from bbox areas (ellipses).
    s = eval_samples[0]
    bbox_area = (s["boxes"][:, 2] - s["boxes"][:, 0]) * \
        (s["boxes"][:, 3] - s["boxes"][:, 1])
    assert not np.allclose(s["areas"], bbox_area)


def test_drill_pipeline_throughput_and_buckets(drill_dataset):
    ann, imgs = drill_dataset
    loader = Inferred("coco", [ann, imgs])
    cfg = _cfg_data = DataConfig(
        dataset=("coco", ann, imgs), image_size=64,
        buckets=((48, 64), (64, 48), (64, 64)), batch_size=4,
        shuffle_buffer=8, num_workers=4)
    pipe = build_pipeline(loader, _cfg_data, max_boxes=8, training=True,
                          seed=0)
    t0 = time.perf_counter()
    n_images = 0
    shapes = set()
    for batch in pipe.prefetched(0):
        n_images += batch.images.shape[0]
        shapes.add(batch.images.shape[1:3])
    dt = time.perf_counter() - t0
    assert n_images >= 40  # per-bucket remainders dropped, bulk survives
    assert len(shapes) >= 2  # multiple buckets actually exercised
    # Host throughput is recorded for the NOTES table; just sanity here.
    assert n_images / dt > 20


def test_drill_train_checkpoint_bucketed_eval(drill_dataset, tmp_path):
    import jax

    from retinanet_tpu.eval_coco import COCOEvaluator, evaluate_model
    from retinanet_tpu.infer import Detector
    from retinanet_tpu.train import Trainer

    ann, imgs = drill_dataset
    cfg = _cfg(tmp_path, ann, imgs)
    trainer = Trainer(cfg)
    assert trainer.model.num_classes == 20
    state = trainer.fit()
    assert int(state.step) == 2
    assert trainer.latest_checkpoint_step() == 2

    eval_loader = Inferred("coco", [ann, imgs], include_crowds=True)
    det = Detector(cfg, jax.device_get(state.params),
                   eval_loader.class_names, use_pallas=False)

    # Count every add(): bucketed eval must cover ALL images (no drops).
    import retinanet_tpu.eval_coco as ec
    calls = []
    orig = ec.COCOEvaluator.add

    def counting(self, d, g):
        calls.append(g)
        return orig(self, d, g)

    ec.COCOEvaluator.add = counting
    try:
        metrics = evaluate_model(det, eval_loader, cfg)
    finally:
        ec.COCOEvaluator.add = orig
    assert len(calls) == len(eval_loader)
    assert any(g.get("iscrowd") is not None and g["iscrowd"].any()
               for g in calls)  # crowds reached the evaluator
    for key in ("mAP", "AP50", "AR@100"):
        assert key in metrics
    assert np.isfinite(metrics["mAP"]) or metrics["mAP"] == 0.0
