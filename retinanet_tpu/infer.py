"""Inference path — first-class, unlike the reference.

The reference has **no** predict/serve/evaluate entry point (``model_fn``
handles only TRAIN, ``train.py:207``); its decode+NMS exists solely to render
TensorBoard summaries.  Here inference is the north-star serving metric:

  ``make_inference_fn`` builds one jit-compiled function
  images → forward (bf16) → per-level top-k decode → fused classwise NMS
  with everything static-shape, end-to-end on device.

``Detector`` wraps it with parameter loading and host-side conversion back to
per-image numpy detections in original-image pixel coordinates.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from retinanet_tpu.config import Config
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.ops.anchors import Levels, build_levels
from retinanet_tpu.ops.nms import BoxesDecoded, decode_levels, nms_padded


def make_inference_fn(model: RetinaNet, levels: Levels, config: Config,
                      use_pallas: Optional[bool] = None, mesh=None):
    """(params, images [B,H,W,3]) → BoxesDecoded, fully jit-compiled.

    ``use_pallas=None`` defers to ``config.nms.use_pallas`` (default: the
    fori_loop fallback, which out-measures the Pallas suppression kernel
    at every batch size after the packed-key decode — see NMSConfig).

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel serving —
    params replicated, the batch (and every per-image output) sharded over
    the data axis.  Decode + NMS are purely per-image, so the sharded
    program needs NO collectives: XLA runs one independent shard per device
    (equivalence-tested 8-way vs 1 in ``tests/test_parallel.py``).  On a
    2-D ``(data, space)`` mesh (``ParallelConfig.spatial``) image height is
    additionally band-sharded and XLA inserts the conv halo exchanges.  The
    reference's serving story was single-GPU only (it had none at all —
    ``model_fn`` handles TRAIN exclusively, ``/root/reference/train.py:207``).
    Batch size must be divisible by the mesh size.
    """
    nms_cfg = config.nms

    def infer(params, images: Array) -> BoxesDecoded:
        from retinanet_tpu.ops.nms import fused_decode_nms
        from retinanet_tpu.ops.preprocess import maybe_normalize
        up = use_pallas
        if up is None:
            up = nms_cfg.use_pallas and jax.default_backend() == "tpu"
        images = maybe_normalize(images, config.data)
        out = model.apply({"params": params}, images, training=False)
        # Canvas dims from the batch itself: rectangular-bucket batches
        # decode correctly through the same jitted fn (one program/shape).
        # fused_decode_nms defers the box gathers past the pre-NMS
        # selection (equality-tested against decode_levels + nms_padded).
        return fused_decode_nms(out["classifications"], out["regressions"],
                                levels, images.shape[1:3], nms_cfg,
                                use_pallas=up)

    if mesh is None:
        return jax.jit(infer)
    from retinanet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                             replicated)
    # Images additionally shard their height on a 2-D (data, space) mesh
    # (image_sharding == batch_sharding on the default 1-D mesh); detection
    # outputs have no spatial dim and stay batch-sharded.
    batch = batch_sharding(mesh)
    return jax.jit(infer, in_shardings=(replicated(mesh),
                                        image_sharding(mesh)),
                   out_shardings=batch)


class Detector:
    """User-facing inference wrapper."""

    def __init__(self, config: Config, params, class_names: List[str],
                 use_pallas: Optional[bool] = None, mesh=None):
        self.config = config
        self.class_names = class_names
        self.levels = build_levels(config.anchors)
        self.model = RetinaNet.from_config(
            config.model, num_anchors=self.levels.num_anchors,
            num_classes=len(class_names))
        self.params = params
        if mesh is not None:
            # Batch shards over the data axis only (a 2-D spatial mesh
            # shards image height, not batch, on its second axis).
            n_data = mesh.shape[mesh.axis_names[0]]
            if config.data.batch_size % n_data:
                raise ValueError(
                    f"data-parallel serving needs batch_size divisible by "
                    f"the data axis ({config.data.batch_size} % {n_data}"
                    " != 0)")
        self._fn = make_inference_fn(self.model, self.levels, config,
                                     use_pallas, mesh=mesh)

    def __call__(self, images: np.ndarray) -> BoxesDecoded:
        """images: [B, S, S, 3] normalized float32 → device BoxesDecoded."""
        return self._fn(self.params, jnp.asarray(images))

    def detect(self, images: np.ndarray,
               scales: Optional[np.ndarray] = None) -> List[Dict]:
        """Per-image numpy detections; ``scales`` maps canvas → original px.

        Returns dicts with ``boxes`` (t,l,b,r pixels), ``scores``,
        ``class_ids`` holding only valid detections.
        """
        out = jax.device_get(self(images))
        # Pixel scale comes from the actual batch canvas, per-dimension —
        # decode normalizes boxes by (H, W) of the batch (see
        # make_inference_fn), so rectangular-bucket canvases and sizes that
        # differ from config.data.image_size round-trip correctly.
        canvas_h, canvas_w = images.shape[1], images.shape[2]
        scale_tlbr = np.array([canvas_h, canvas_w, canvas_h, canvas_w],
                              np.float32)
        results = []
        for i in range(out.boxes.shape[0]):
            valid = out.valid[i]
            boxes = out.boxes[i][valid] * scale_tlbr
            if scales is not None:
                boxes = boxes / scales[i]
            results.append({
                "boxes": boxes,
                "scores": out.scores[i][valid],
                "class_ids": out.class_ids[i][valid],
            })
        return results


def _jaxpr_flops(jaxpr) -> float:
    """Sum conv/dot FLOPs over a jaxpr, recursing into sub-jaxprs.

    Counts only the MXU ops (conv_general_dilated, dot_general) — they are
    >99% of the model's arithmetic; elementwise ops are bandwidth, not FLOPs,
    on the roofline this number feeds.
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            out_shape = eqn.outvars[0].aval.shape
            rhs_shape = eqn.invars[1].aval.shape
            rhs_spec = eqn.params["dimension_numbers"].rhs_spec
            # kernel = [spatial..., in_features/groups, out_features] in some
            # order; rhs_spec = (out_feature_dim, in_feature_dim, spatial...).
            k_in = rhs_shape[rhs_spec[1]]
            k_spatial = 1
            for d in rhs_spec[2:]:
                k_spatial *= rhs_shape[d]
            total += 2.0 * float(np.prod(out_shape)) * k_spatial * k_in
        elif name == "dot_general":
            out_shape = eqn.outvars[0].aval.shape
            (lhs_c, _), _ = eqn.params["dimension_numbers"]
            lhs_shape = eqn.invars[0].aval.shape
            k = 1
            for d in lhs_c:
                k *= lhs_shape[d]
            total += 2.0 * float(np.prod(out_shape)) * k
        else:
            mult = eqn.params.get("length", 1) if name == "scan" else 1
            for v in eqn.params.values():
                vals = v if isinstance(v, (tuple, list)) else (v,)
                for item in vals:
                    sub = getattr(item, "jaxpr", None)
                    if sub is not None and hasattr(sub, "eqns"):
                        total += mult * _jaxpr_flops(sub)
                    elif hasattr(item, "eqns"):
                        total += mult * _jaxpr_flops(item)
    return total


def forward_gflops_per_image(config: Config, num_classes: int = 80,
                             algorithmic: bool = False) -> float:
    """Analytic forward GFLOPs/image of the model at the config's image size.

    Traced from the UNFUSED float model (the Pallas fused blocks compute the
    same math but hide it from the jaxpr); tracing is host-only — no compile,
    no device work.  Feeds the bench record's MFU / ceiling note.

    ``algorithmic=True`` traces grouped convs with their true
    ``feature_group_count`` even where the model would lower them to
    block-diagonal dense (``Conv.grouped_as_dense``, a deliberate 32x-MAC
    trade measured faster on the MXU) — i.e. the FLOPs the model *needs*,
    the fair roofline-ceiling basis.  Default counts what the chip executes.
    """
    import contextlib
    import dataclasses

    from retinanet_tpu.models import layers as _layers

    model_cfg = dataclasses.replace(
        config.model, fused_blocks=False, fused_res2=False,
        fused_res3_strips=0, fused_res4_strips=0, quantize="none")
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(model_cfg, levels.num_anchors, num_classes)
    size = config.data.image_size
    ctx = (_layers.force_true_grouped() if algorithmic
           else contextlib.nullcontext())
    with ctx:
        params = jax.eval_shape(
            lambda rng, x: model.init(rng, x, training=False),
            jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))["params"]
        img = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
        traced = jax.jit(
            lambda p, x: model.apply({"params": p}, x, training=False)
        ).trace(params, img)
    return _jaxpr_flops(traced.jaxpr.jaxpr) / 1e9


def benchmark(config: Config, batch_size: int = 8, steps: int = 20,
              warmup: int = 3, num_classes: int = 80) -> Dict[str, float]:
    """images/sec + p50 latency of the full inference path on random data."""
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model, levels.num_anchors,
                                  num_classes)
    size = config.data.image_size
    rng = jax.random.PRNGKey(0)
    # Fully-convolutional: init on a tiny dummy (param shapes are size-free).
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    fn = make_inference_fn(model, levels, config)
    images = jax.random.normal(rng, (batch_size, size, size, 3),
                               jnp.float32)

    def sync(out):
        # device_get forces real completion — block_until_ready alone does
        # not reliably synchronize through the remote-TPU tunnel.
        jax.device_get(out.scores)

    for _ in range(warmup):
        sync(fn(params, images))

    # Throughput: chain `steps` dispatches, sync once — per-call host sync
    # would measure tunnel round-trips, not device time.
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(params, images)
    sync(out)
    total = time.perf_counter() - t0

    # Latency: per-call with sync (includes one host round-trip).
    lat = []
    for _ in range(min(steps, 10)):
        t1 = time.perf_counter()
        sync(fn(params, images))
        lat.append(time.perf_counter() - t1)
    lat = np.asarray(lat)
    return {
        "images_per_sec": batch_size * steps / total,
        "p50_latency_ms": float(np.percentile(lat, 50)) * 1e3,
        "p99_latency_ms": float(np.percentile(lat, 99)) * 1e3,
        "batch_size": batch_size,
        "image_size": size,
    }
