"""COCO-json and Pascal-XML loader tests on synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from retinanet_tpu.data.loaders.coco import COCO
from retinanet_tpu.data.loaders.pascal import Pascal


@pytest.fixture
def coco_fixture(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 50, "height": 50},
            {"id": 3, "file_name": "c.jpg", "width": 50, "height": 50},
        ],
        # Non-contiguous category ids on purpose: must be densely re-indexed
        # in sorted order (reference coco.py:13,57).
        "categories": [
            {"id": 7, "name": "cat"},
            {"id": 3, "name": "dog"},
            {"id": 21, "name": "bird"},
        ],
        "annotations": [
            # [left, top, w, h] → expect [t, l, b, r].
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 3,
             "bbox": [0, 0, 5, 5], "iscrowd": 0},
            {"id": 3, "image_id": 1, "category_id": 21,
             "bbox": [1, 1, 0.5, 10], "iscrowd": 0},  # degenerate: skipped
            {"id": 4, "image_id": 2, "category_id": 7,
             "bbox": [5, 5, 10, 10], "iscrowd": 1},   # crowd: skipped
        ],
    }
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(img_dir)


def test_coco_loader(coco_fixture):
    ann_path, img_dir = coco_fixture
    dl = COCO(ann_path, img_dir)
    # Categories sorted by id: 3=dog, 7=cat, 21=bird.
    assert dl.class_names == ["dog", "cat", "bird"]
    assert dl.num_classes == 3

    samples = list(dl)
    # Image 2 has only a crowd ann → skipped; image 3 has none → skipped.
    assert len(samples) == 1
    s = samples[0]
    assert s["image_file"].endswith("a.jpg")
    # bbox [10,20,30,40] → [t=20, l=10, b=60, r=40]; degenerate one dropped.
    np.testing.assert_allclose(s["boxes"],
                               [[20, 10, 60, 40], [0, 0, 5, 5]])
    np.testing.assert_array_equal(s["class_ids"], [1, 0])  # cat→1, dog→0
    assert len(dl) == 1


@pytest.fixture
def pascal_fixture(tmp_path):
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main" / "trainval.txt").write_text(
        "img001\n")
    xml = """<annotation>
      <object><name>dog</name>
        <bndbox><ymin>10</ymin><xmin>20</xmin><ymax>50</ymax><xmax>60</xmax>
        </bndbox></object>
      <object><name>person</name>
        <bndbox><ymin>1</ymin><xmin>2</xmin><ymax>3</ymax><xmax>4</xmax>
        </bndbox></object>
    </annotation>"""
    (tmp_path / "Annotations" / "img001.xml").write_text(xml)
    return str(tmp_path)


def test_pascal_loader(pascal_fixture):
    dl = Pascal(pascal_fixture, "trainval")
    assert dl.num_classes == 20
    samples = list(dl)
    assert len(samples) == 1
    s = samples[0]
    assert s["image_file"].endswith("img001.jpg")
    np.testing.assert_allclose(s["boxes"], [[10, 20, 50, 60], [1, 2, 3, 4]])
    assert s["class_ids"][0] == dl.class_names.index("dog")
    assert s["class_ids"][1] == dl.class_names.index("person")
    assert len(dl) == 1


def test_coco_end_to_end_train_and_eval(tmp_path):
    """Full loop through the COCO-format path: real JPEG files on disk →
    loader → pipeline → 2 train steps → streaming evaluation.  (The shapes
    dataset covers the in-memory path; this covers file decode + COCO
    bookkeeping end-to-end.)"""
    import dataclasses

    import jax

    from retinanet_tpu.config import (AssignConfig, Config, DataConfig,
                                      ModelConfig, NMSConfig, TrainConfig)
    from retinanet_tpu.eval_coco import evaluate_model
    from retinanet_tpu.infer import Detector
    from retinanet_tpu.train import Trainer, create_train_state

    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 needed to write JPEG fixtures")

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(4):
        name = f"im{i}.jpg"
        arr = rng.randint(0, 255, (64, 48, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / name), arr)
        images.append({"id": i + 1, "file_name": name,
                       "width": 48, "height": 64})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [8, 8, 24, 32], "iscrowd": 0})
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps({
        "images": images,
        "categories": [{"id": 1, "name": "thing"}],
        "annotations": anns,
    }))

    cfg = Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=1,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(dataset=("coco", str(ann_path), str(img_dir)),
                        image_size=64, batch_size=2, shuffle_buffer=1,
                        num_workers=2),
        assign=AssignConfig(max_boxes=4),
        nms=NMSConfig(use_pallas=False, top_k_per_level=20,
                      pre_nms_top_k=40, max_output_size=10,
                      score_threshold=0.05),
        train=TrainConfig(experiment=str(tmp_path / "exp"), epochs=1,
                          steps_per_epoch=2, checkpoint_every=1000,
                          log_every=1, learning_rate=1e-3),
    )
    trainer = Trainer(cfg)
    assert trainer.loader.class_names == ["thing"]
    state = trainer.fit()
    assert int(state.step) == 2

    det = Detector(cfg, jax.device_get(state.params), ["thing"],
                   use_pallas=False)
    metrics = evaluate_model(det, trainer.loader, cfg)
    assert np.isfinite(metrics["mAP"]) or metrics["mAP"] == 0.0
    assert "AR@100" in metrics


def test_coco_len_matches_iteration_with_degenerate_only_images(tmp_path):
    """__len__ must agree exactly with __iter__ (the multi-host per-epoch
    step cap divides len(loader); a mismatch deadlocks a process): images
    whose only annotations are sub-pixel boxes are skipped by BOTH."""
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 50, "height": 50},
                   {"id": 2, "file_name": "b.jpg", "width": 50, "height": 50}],
        "categories": [{"id": 1, "name": "x"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [1, 1, 0.5, 10], "iscrowd": 0},  # degenerate only
            {"id": 2, "image_id": 2, "category_id": 1,
             "bbox": [5, 5, 10, 10], "iscrowd": 0},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    dl = COCO(str(p), str(tmp_path))
    assert len(dl) == len(list(dl)) == 1


def test_coco_eval_mode_yields_empty_images(tmp_path):
    """include_crowds (eval) mode yields annotation-free images with empty
    arrays — pycocotools evaluates every image, and detections on empty
    images must count as FPs.  Training mode still skips them."""
    from retinanet_tpu.data.loaders.inferred import Inferred

    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 50, "height": 50},
                   {"id": 2, "file_name": "b.jpg", "width": 50, "height": 50}],
        "categories": [{"id": 1, "name": "x"}],
        "annotations": [
            {"id": 1, "image_id": 2, "category_id": 1,
             "bbox": [5, 5, 10, 10], "iscrowd": 0},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    train_dl = Inferred("coco", [str(p), str(tmp_path)])
    assert len(list(train_dl)) == 1
    eval_dl = Inferred("coco", [str(p), str(tmp_path)], include_crowds=True)
    samples = list(eval_dl)
    assert len(samples) == len(eval_dl) == 2
    empty = [s for s in samples if s["boxes"].shape[0] == 0][0]
    assert empty["iscrowd"].shape == (0,) and empty["areas"].shape == (0,)

    # Empty-image FPs lower mAP: one perfect TP image + one empty image
    # with a detection → precision < 1 at the FP's score.
    from retinanet_tpu.eval_coco import COCOEvaluator
    ev = COCOEvaluator(1)
    ev.add({"boxes": np.array([[5, 5, 15, 15]], np.float32),
            "scores": np.array([0.9], np.float32),
            "class_ids": np.array([0])},
           {"boxes": np.array([[5, 5, 15, 15]], np.float32),
            "class_ids": np.array([0])})
    ev.add({"boxes": np.array([[1, 1, 9, 9]], np.float32),
            "scores": np.array([0.95], np.float32),  # FP ranked first
            "class_ids": np.array([0])},
           {"boxes": np.zeros((0, 4), np.float32),
            "class_ids": np.zeros((0,), int)})
    out = ev.summarize()
    assert 0 < out["mAP"] < 1.0


def test_inferred_forwards_coco_category_ids(coco_fixture):
    """Inferred must forward the wrapped COCO loader's original category
    ids (evaluate --dump-detections emits canonical ids through it) and
    return None for loaders without the concept."""
    from retinanet_tpu.data.loaders.inferred import Inferred

    ann, imgs = coco_fixture
    wrapped = Inferred("coco", [ann, imgs])
    direct = COCO(ann, imgs)
    assert wrapped.coco_category_ids == direct.coco_category_ids
    assert list(wrapped.coco_category_ids) == [3, 7, 21]  # sorted originals

    shapes = Inferred("shapes", ["/tmp/unused", "4", "64"])
    assert shapes.coco_category_ids is None


def test_pascal_difficult_flags(tmp_path):
    """VOC eval mode: the difficult flag is parsed and exposed; training
    mode keeps difficult objects as ordinary positives with no extra key
    (the reference never parses the flag, pascal.py:36-43)."""
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main" / "val.txt").write_text("im1\n")
    (tmp_path / "Annotations" / "im1.xml").write_text("""<annotation>
      <object><name>dog</name><difficult>1</difficult>
        <bndbox><ymin>10</ymin><xmin>20</xmin><ymax>50</ymax><xmax>60</xmax>
        </bndbox></object>
      <object><name>cat</name><difficult>0</difficult>
        <bndbox><ymin>1</ymin><xmin>2</xmin><ymax>30</ymax><xmax>40</xmax>
        </bndbox></object>
      <object><name>person</name>
        <bndbox><ymin>5</ymin><xmin>6</xmin><ymax>70</ymax><xmax>80</xmax>
        </bndbox></object>
    </annotation>""")

    train = next(iter(Pascal(str(tmp_path), "val")))
    assert "difficult" not in train
    assert len(train["boxes"]) == 3  # difficult kept as positives

    eval_mode = next(iter(Pascal(str(tmp_path), "val",
                                 include_difficult_flags=True)))
    assert eval_mode["difficult"].tolist() == [True, False, False]

    # Through the Inferred wrapper's eval mode, too.
    from retinanet_tpu.data.loaders.inferred import Inferred
    wrapped = next(iter(Inferred("pascal", [str(tmp_path), "val"],
                                 include_crowds=True)))
    assert wrapped["difficult"].tolist() == [True, False, False]


def test_pascal_empty_difficult_tag(tmp_path):
    """Empty <difficult/> tags (some annotation tools) must parse as
    not-difficult, not crash."""
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main" / "t.txt").write_text("im1\n")
    (tmp_path / "Annotations" / "im1.xml").write_text("""<annotation>
      <object><name>dog</name><difficult/>
        <bndbox><ymin>1</ymin><xmin>2</xmin><ymax>30</ymax><xmax>40</xmax>
        </bndbox></object>
    </annotation>""")
    s = next(iter(Pascal(str(tmp_path), "t", include_difficult_flags=True)))
    assert s["difficult"].tolist() == [False]
    # Training mode (no flag parse requested) also survives.
    s = next(iter(Pascal(str(tmp_path), "t")))
    assert len(s["boxes"]) == 1
