"""Evaluation CLI — mAP over a dataset from a training checkpoint.

A capability the reference lacks entirely (TRAIN-only ``model_fn``,
``/root/reference/train.py:207``); required by the north-star mAP-parity
target.

Usage::

    python -m retinanet_tpu.evaluate --dataset shapes /tmp/shapes 64 256 \
        --experiment experiments/run1 [--max-images 500]
"""

from __future__ import annotations

import argparse
import json
import logging

import jax

from retinanet_tpu.config import Config, _apply_dotted
from retinanet_tpu.data.loaders.inferred import Inferred
from retinanet_tpu.eval_coco import evaluate_model
from retinanet_tpu.infer import Detector
from retinanet_tpu.train import create_train_state

logger = logging.getLogger(__name__)


def load_detector(config: Config, loader, step=None, mesh=None,
                  average_last: int = None) -> Detector:
    """Build a Detector from the experiment's latest (or given) checkpoint.

    Goes through :class:`~retinanet_tpu.train.CheckpointStore` directly —
    NOT a Trainer — so serving never inherits training-only validations
    (a multi-host eval shards the dataset across processes, not the batch,
    and must not be rejected for batch-vs-mesh divisibility).

    ``average_last=N`` serves the elementwise mean of the newest N
    checkpoints' params instead of a single checkpoint — checkpoint
    averaging, the classic cheap eval boost (SWA-style; no equivalent in
    the reference, which had no eval at all).  Measured on the round-4
    flagship run: avg-2 mAP 0.8183 vs last-checkpoint 0.7510 (NOTES).
    """
    import os

    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.ops.anchors import build_levels
    from retinanet_tpu.train import CheckpointStore

    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model,
                                  num_anchors=levels.num_anchors,
                                  num_classes=loader.num_classes)
    store = CheckpointStore(config.train.experiment,
                            config.train.keep_checkpoints)
    if average_last is not None and average_last > 1:
        if step is not None:
            raise ValueError("--step and --average-checkpoints are "
                             "mutually exclusive")
        steps = store.checkpoint_steps()[-average_last:]
        if not steps:
            raise FileNotFoundError(
                f"no checkpoints in {store.checkpoint_dir}")
        if len(steps) < average_last:
            logger.warning("only %d checkpoints available for "
                           "--average-checkpoints %d", len(steps),
                           average_last)
        template = create_train_state(model, config,
                                      jax.random.PRNGKey(0)).params
        acc = None
        for s in steps:
            params = store.restore_params(template, s)
            acc = params if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, params)
        n = float(len(steps))
        avg = jax.tree_util.tree_map(lambda a: a / n, acc)
        logger.info("serving the average of checkpoints %s", steps)
        return Detector(config, avg, loader.class_names, mesh=mesh)
    if step is not None:
        # Fail fast on a missing checkpoint — before the (expensive)
        # parameter init compiles anything.
        path = os.path.join(store.checkpoint_dir, f"step_{step}")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"no checkpoint at step {step} in {store.checkpoint_dir} "
                f"(latest available: {store.latest_checkpoint_step()})")
    elif store.latest_checkpoint_step() is None:
        # Without this, restore would silently return the random-init
        # state and the caller would serve garbage with rc=0.
        raise FileNotFoundError(
            f"no checkpoints in {store.checkpoint_dir} — wrong "
            f"--experiment path, or the run never saved one")
    template = create_train_state(model, config,
                                  jax.random.PRNGKey(0)).params
    params = store.restore_params(template, step)
    return Detector(config, params, loader.class_names, mesh=mesh)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from retinanet_tpu.utils.cli import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, nargs="+", required=True)
    parser.add_argument("--experiment", type=str, default=None)
    parser.add_argument(
        "--from-export", type=str, default=None, metavar="PATH.npz",
        help="evaluate a single-file serving artifact (python -m "
             "retinanet_tpu.export) instead of an experiment checkpoint; "
             "the artifact's class set must match the dataset's")
    parser.add_argument("--scale", type=int, default=None,
                        help="eval canvas size (default 600, or the export "
                             "artifact's recorded serving size)")
    parser.add_argument("--backbone", type=str, default="resnet_50")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument(
        "--buckets", type=str, nargs="+", default=None, metavar="HxW",
        help="rectangular canvas buckets, e.g. --buckets 640x640 640x448 "
             "448x640: each image evaluates on its least-padding bucket "
             "(one compiled program per bucket) — mirror the training "
             "--buckets so the model serves under the geometry it "
             "trained on")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--score-threshold", type=float, default=None,
                        help="post-NMS score filter on reported detections")
    parser.add_argument(
        "--decode-threshold", type=float, default=0.05,
        help="decode validity threshold; mAP integrates the PR curve over "
             "scores, so keep this low (COCO practice: 0.05).  The "
             "reference's 0.5 is a *display* threshold (utils.py:186) and "
             "truncates the curve.")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument(
        "--average-checkpoints", type=int, default=None, metavar="N",
        help="evaluate the elementwise mean of the newest N checkpoints "
             "(checkpoint averaging; mutually exclusive with --step)")
    parser.add_argument(
        "--approx-top-k", action="store_true",
        help="approx_max_k candidate selection (the serving fast path; "
             "single-pass TPU PartialReduce, >=95%% of the true per-level "
             "top-k)")
    parser.add_argument(
        "--approx-global-top-k", action="store_true",
        help="also approximate the GLOBAL pre-NMS selection (merged "
             "levels -> pre_nms_top_k) with approx_max_k — the remaining "
             "exact sort in the fused serving path")
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "int8"],
                        help="int8: post-training-quantized serving path "
                             "(same checkpoint, conv layers in s8×s8→s32)")
    parser.add_argument(
        "--fused-blocks", action="store_true",
        help="fused whole-bottleneck Pallas serving kernels for the dense "
             "ResNet backbone (1 HBM read + 1 write per identity block); "
             "checkpoint-compatible with the unfused model")
    parser.add_argument(
        "--fused-res2", action="store_true",
        help="with --fused-blocks: extend fusion to res2 via the "
             "strip-tiled kernel (fused_res2_strips=20, the measured "
             "winner — NOTES round 4)")
    parser.add_argument(
        "--fused-res3-strips", type=int, default=0, metavar="R",
        help="with --fused-blocks: strip-tile the fused res3+ kernels "
             "over R-row bands instead of whole-image residency "
             "(r4levers measured winner: 10)")
    parser.add_argument(
        "--fused-res4-strips", type=int, default=0, metavar="R",
        help="with --fused-blocks: strip-tile the fused res4 kernels "
             "(r4levers2 measured winner: 10)")
    parser.add_argument(
        "--data-parallel", action="store_true",
        help="shard eval batches over ALL local devices (params replicated, "
             "batch split on a 1-D data mesh; no collectives — decode/NMS "
             "are per-image).  batch-size must be divisible by the device "
             "count.")
    parser.add_argument(
        "--spatial", type=int, default=1, metavar="S",
        help="with --data-parallel: additionally shard image height over S "
             "devices (2-D (data, space) mesh, GSPMD spatial partitioning; "
             "device count and canvas height must divide S)")
    parser.add_argument(
        "--dump-detections", type=str, default=None, metavar="PATH",
        help="also write every detection in canonical COCO-results JSON "
             "([{image_id, category_id, bbox [x,y,w,h], score}]) so the "
             "built-in evaluator can be cross-checked offline with "
             "pycocotools (COCO.loadRes + COCOeval)")
    parser.add_argument(
        "--platform", type=str, default=None, metavar="NAME",
        help="pin JAX to a platform (e.g. 'cpu') in-process; the "
             "JAX_PLATFORMS env var is unreliable under platform plugins "
             "that register at import time")
    parser.add_argument(
        "--per-class", action="store_true",
        help="also report per-class AP (COCO: mAP@[.5:.95]; VOC: VOC07)")
    parser.add_argument(
        "--protocol", type=str, default="coco", choices=["coco", "voc"],
        help="evaluation protocol: COCO (mAP@[.5:.95], area ranges, AR) or "
             "Pascal VOC (AP@0.5 with difficult-GT ignores, VOC07 11-point "
             "+ VOC12 continuous)")
    args = parser.parse_args(argv)

    from retinanet_tpu.utils.cli import force_platform
    force_platform(args.platform)

    scale = args.scale
    if scale is None:
        # The export artifact records its serving canvas; honor it so the
        # artifact evaluates under the geometry it was built for.
        scale = 600
        if args.from_export:
            from retinanet_tpu.export import read_meta
            scale = int(read_meta(args.from_export)["image_size"])

    config = Config()
    for dotted, value in [
        ("data.dataset", tuple(args.dataset)),
        ("data.image_size", scale),
        ("data.batch_size", args.batch_size),
        ("model.backbone", args.backbone),
        ("model.quantize", args.quantize),
        ("train.experiment", args.experiment or ""),
        ("nms.score_threshold", args.decode_threshold),
        ("nms.use_approx_top_k", bool(args.approx_top_k)),
        ("nms.use_approx_global_top_k", bool(args.approx_global_top_k)),
        ("model.fused_blocks", bool(args.fused_blocks)),
        ("model.fused_res2", bool(args.fused_res2)),
        ("model.fused_res3_strips", args.fused_res3_strips),
        ("model.fused_res4_strips", args.fused_res4_strips),
    ]:
        config = _apply_dotted(config, dotted, value)
    if args.buckets is not None:
        from retinanet_tpu.config import parse_buckets
        config = _apply_dotted(config, "data.buckets",
                               parse_buckets(args.buckets))

    # Evaluation mode: crowd annotations become ignore regions (COCO eval
    # protocol) rather than being dropped (the training behaviour).
    loader = Inferred(args.dataset[0], args.dataset[1:], include_crowds=True)
    # Multi-process eval (the caller — pod runtime or test harness — has
    # already joined the cluster via jax.distributed.initialize): each
    # process detects its round-robin shard of the dataset, match records
    # are all-gathered once at the end, and every process computes
    # identical metrics (bit-equal to a single-process run).
    num_procs = jax.process_count()
    process_shard = (jax.process_index(), num_procs) if num_procs > 1 \
        else None
    mesh = None
    if args.data_parallel:
        from retinanet_tpu.config import ParallelConfig
        from retinanet_tpu.parallel.mesh import make_mesh
        # Detection needs no collectives (decode/NMS are per-image), so
        # under multi-process each process shards its batches over its OWN
        # local devices — a global mesh would need globally-assembled
        # arrays for no benefit.
        devices = jax.local_devices() if num_procs > 1 else None
        mesh = make_mesh(ParallelConfig(spatial=args.spatial),
                         devices=devices)
        logger.info("data-parallel serving over %d devices%s", mesh.size,
                    f" (spatial={args.spatial})" if args.spatial > 1 else "")
    elif args.spatial > 1:
        raise SystemExit("--spatial requires --data-parallel")
    if args.from_export:
        if args.average_checkpoints:
            raise SystemExit("--average-checkpoints needs an experiment "
                             "checkpoint dir; a --from-export artifact "
                             "holds exactly one parameter set")
        from retinanet_tpu.export import load_exported_detector
        detector = load_exported_detector(args.from_export, config=config,
                                          mesh=mesh)
        if list(detector.class_names) != list(loader.class_names):
            # Order matters: class ids are positional.
            raise SystemExit(
                f"export classes {detector.class_names} do not match the "
                f"dataset's {loader.class_names} (same names, same order)")
    elif args.experiment:
        detector = load_detector(config, loader, args.step, mesh=mesh,
                                 average_last=args.average_checkpoints)
    else:
        raise SystemExit("need --experiment (checkpoint dir) or "
                         "--from-export (serving artifact)")
    sink = None
    dump: list = []
    if args.dump_detections:
        # Contiguous class index -> original COCO category id when the
        # loader knows it (COCO json); identity otherwise.
        cat_ids = getattr(loader, "coco_category_ids", None)

        def sink(gt, det):
            image_id = gt.get("image_id")
            for (t, l, b, r), score, cls in zip(
                    det["boxes"], det["scores"], det["class_ids"]):
                cls = int(cls)
                dump.append({
                    "image_id": (int(image_id) if image_id is not None
                                 else len(dump)),
                    "category_id": (int(cat_ids[cls]) if cat_ids is not None
                                    else cls),
                    "bbox": [float(l), float(t),
                             float(r - l), float(b - t)],
                    "score": float(score),
                })

    metrics = evaluate_model(detector, loader, config,
                             max_images=args.max_images,
                             score_threshold=args.score_threshold,
                             detections_sink=sink,
                             protocol=args.protocol,
                             per_class=args.per_class,
                             process_shard=process_shard)
    is_lead = jax.process_index() == 0
    if args.dump_detections and is_lead:
        # The sink replays the gathered records on every process, so the
        # dump is complete everywhere — but only the lead writes it.
        with open(args.dump_detections, "w") as f:
            json.dump(dump, f)
        logger.info("wrote %d detections to %s (COCO-results format)",
                    len(dump), args.dump_detections)
    import math
    if is_lead:
        # nan = "no GT in this area bucket" → null (strict-JSON safe).
        print(json.dumps({k: (None if isinstance(v, float) and math.isnan(v)
                              else v) for k, v in metrics.items()}))
    return metrics


if __name__ == "__main__":
    main()
