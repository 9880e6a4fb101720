"""Detection CLI (retinanet_tpu/detect.py): checkpoint + image files →
annotated PNGs + JSON, exercised end-to-end on a tiny shapes checkpoint."""

import json
import os

import numpy as np
from PIL import Image

from retinanet_tpu.config import (Config, DataConfig, ModelConfig,
                                  TrainConfig)
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.train import Trainer


def test_detect_cli_end_to_end(tmp_path):
    exp = str(tmp_path / "exp")
    cfg = Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0),
        data=DataConfig(image_size=64, batch_size=2),
        train=TrainConfig(experiment=exp, learning_rate=1e-3,
                          checkpoint_every=2),
    )
    loader = Shapes(None, 4, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    trainer.fit(epochs=1, steps_per_epoch=2)
    assert trainer.latest_checkpoint_step() == 2

    # Two input images from the same generator family (uint8 RGB PNGs).
    paths = []
    for i, sample in zip(range(2), iter(loader)):
        p = str(tmp_path / f"in_{i}.png")
        Image.fromarray(sample["image"].astype(np.uint8)).save(p)
        paths.append(p)

    from retinanet_tpu.detect import main
    out_dir = str(tmp_path / "out")
    dump = str(tmp_path / "dets.json")
    # Low display threshold: after 2 steps class probs sit near the
    # pi=0.01 init prior, so 0.003 guarantees detections flow through.
    main(paths + [
        "--experiment", exp, "--backbone", "mobilenet_v2", "--scale", "64",
        "--batch-size", "2", "--class-names", ",".join(loader.class_names),
        "--score-threshold", "0.003", "--out", out_dir, "--dump-json", dump])

    for i in range(2):
        png = os.path.join(out_dir, f"in_{i}.det.png")
        assert os.path.exists(png)
        assert Image.open(png).size == (64, 64)  # original size, not canvas
    dets = json.load(open(dump))
    assert len(dets) > 0
    for d in dets[:5]:
        assert d["class"] in loader.class_names
        assert 0.0 < d["score"] <= 1.0
        assert len(d["box_tlbr"]) == 4


def test_detect_load_batch_geometry(tmp_path):
    """_load_batch mirrors the training resize/pad: longer side fits the
    canvas, scale maps original→canvas pixels."""
    from retinanet_tpu.detect import _load_batch

    p = str(tmp_path / "rect.png")
    Image.fromarray(np.full((50, 100, 3), 128, np.uint8)).save(p)
    canvases, scales, originals = _load_batch([p], 64)
    assert canvases.shape == (1, 64, 64, 3)
    assert canvases.dtype == np.float32
    np.testing.assert_allclose(scales[0], 0.64, atol=1e-6)  # 64/100
    assert originals[0].shape == (50, 100, 3)
    # Padding region (below the 32 resized rows) is exactly the
    # normalized zero-pixel.
    assert np.allclose(canvases[0, 40:], canvases[0, 63, 63])


def test_debug_input_cli_renders(tmp_path):
    """debug_input (pipeline visualizer CLI): renders per-sample box and
    per-level trainable-mask PNGs for the shapes pipeline."""
    from retinanet_tpu.debug_input import main

    out = str(tmp_path / "viz")
    main(["--out", out, "--num-samples", "1", "--size", "64"])
    files = os.listdir(out)
    assert any("boxes" in f for f in files)
    assert any("trainable" in f for f in files)
