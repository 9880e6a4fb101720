"""COCO-scale readiness drill at full size (VERDICT r2 #4) — TPU variant.

Generates a 1k-image synthetic COCO-format dataset (rectangular sizes,
crowds, 20 classes), then runs:
  1. host-pipeline throughput (decode + resize + pad + batch, no device)
  2. short bucketed training (train → checkpoint)
  3. bucketed streaming evaluation over the full set (crowds as ignores)

Run: timeout 3000 python _coco_drill.py [--num-images 1000] [--scale 640]
(One TPU process at a time.)
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-images", type=int, default=1000)
    p.add_argument("--scale", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--eval-images", type=int, default=None)
    p.add_argument("--out", type=str, default=None,
                   help="dataset dir (reused if it already has instances.json)")
    args = p.parse_args()

    from retinanet_tpu.utils.cli import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from retinanet_tpu.config import Config, _apply_dotted
    from retinanet_tpu.data.loaders.inferred import Inferred
    from retinanet_tpu.data.pipeline import build_pipeline
    from retinanet_tpu.data.synthetic_coco import generate

    out_dir = args.out or os.path.join(tempfile.gettempdir(), "coco_drill")
    ann = os.path.join(out_dir, "instances.json")
    if not os.path.exists(ann):
        t0 = time.perf_counter()
        ann, img_dir = generate(out_dir, args.num_images, num_classes=20,
                                seed=0, crowd_prob=0.1)
        print(f"generated {args.num_images} images in "
              f"{time.perf_counter()-t0:.1f}s -> {out_dir}", flush=True)
    img_dir = os.path.join(out_dir, "images")

    s = args.scale
    buckets = ((s, s), (s, s * 3 // 4), (s * 3 // 4, s))
    cfg = Config()
    for dotted, value in [
        ("data.dataset", ("coco", ann, img_dir)),
        ("data.image_size", s),
        ("data.buckets", buckets),
        ("data.batch_size", args.batch_size),
        ("model.backbone", "resnet_50_dense"),
        ("model.dropout_rate", 0.0),
        ("train.experiment", os.path.join(out_dir, "exp")),
        ("train.steps_per_epoch", args.train_steps),
        ("train.epochs", 1),
        ("train.checkpoint_every", args.train_steps),
        ("train.log_every", 5),
        ("nms.score_threshold", 0.05),
    ]:
        cfg = _apply_dotted(cfg, dotted, value)

    # 1. Host pipeline throughput (no device work).
    loader = Inferred("coco", [ann, img_dir])
    pipe = build_pipeline(loader, cfg.data, max_boxes=cfg.assign.max_boxes,
                          training=True, seed=0)
    n, t0 = 0, time.perf_counter()
    shapes = {}
    for batch in pipe.prefetched(0):
        n += batch.images.shape[0]
        shapes[batch.images.shape[1:3]] = \
            shapes.get(batch.images.shape[1:3], 0) + 1
    host_dt = time.perf_counter() - t0
    print(f"host pipeline: {n} images in {host_dt:.1f}s = "
          f"{n/host_dt:.1f} img/s; bucket batches: "
          f"{ {str(k): v for k, v in shapes.items()} }", flush=True)

    # 2. Bucketed training + checkpoint.
    from retinanet_tpu.train import Trainer
    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    state = trainer.fit()
    print(f"train: {int(state.step)} steps in "
          f"{time.perf_counter()-t0:.1f}s (incl. compile per bucket); "
          f"checkpoint at {trainer.latest_checkpoint_step()}", flush=True)

    # 3. Bucketed streaming eval with crowds-as-ignores.
    import jax
    from retinanet_tpu.eval_coco import evaluate_model
    from retinanet_tpu.infer import Detector
    eval_loader = Inferred("coco", [ann, img_dir], include_crowds=True)
    det = Detector(cfg, jax.device_get(state.params),
                   eval_loader.class_names)
    t0 = time.perf_counter()
    metrics = evaluate_model(det, eval_loader, cfg,
                             max_images=args.eval_images)
    dt = time.perf_counter() - t0
    n_eval = args.eval_images or len(eval_loader)
    print(f"eval: {n_eval} images in {dt:.1f}s = {n_eval/dt:.1f} img/s")
    import math
    print(json.dumps({k: (None if isinstance(v, float) and math.isnan(v)
                          else round(v, 4)) for k, v in metrics.items()}))


if __name__ == "__main__":
    sys.exit(main())
