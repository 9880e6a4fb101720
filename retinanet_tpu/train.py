"""Training driver (reference ``/root/reference/train.py``), TPU-native.

The reference drives TF-1.x ``tf.estimator`` with a graph ``model_fn``; here
training is one jit-compiled SPMD step over a device mesh:

  host pipeline → device_put (batch sharded on the data axis)
    → on-device label assignment (vmapped, fused into the step)
    → forward (bf16) → loss (+ TF-parity L2) → grad → optax update

Parameters are replicated, the batch is sharded; XLA inserts the gradient
all-reduce over ICI.  Checkpoint/resume via Orbax every
``checkpoint_every`` steps into the experiment directory, same
resume-by-directory UX as ``tf.estimator`` (reference ``train.py:263-273``).
Metrics (losses, grad norm, lr, fg/bg prob histograms — and the mean-IoU
metrics the reference defines but never enables, ``train.py:137-161``) land
in ``<experiment>/metrics.jsonl``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from retinanet_tpu.config import Config, TrainConfig, config_from_args
from retinanet_tpu.data.loaders.inferred import Inferred
from retinanet_tpu.data.pipeline import Batch, build_pipeline
from retinanet_tpu.models.retinanet import RetinaNet, l2_regularization
from retinanet_tpu.ops import assign, boxes as box_ops
from retinanet_tpu.ops.anchors import Levels, build_levels
from retinanet_tpu.ops.losses import detection_loss
from retinanet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated)
from retinanet_tpu.utils.pytree import flatten_levels
from retinanet_tpu.utils.summaries import MetricsWriter, prob_histograms

logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any


def build_schedule(cfg: TrainConfig) -> optax.Schedule:
    """LR schedule: the reference only has a constant LR (train.py:90) and a
    'try cyclical?' TODO (train.py:44); cosine/warmup/cyclical resolve it."""
    base, floor = cfg.learning_rate, cfg.learning_rate * cfg.min_lr_fraction
    if cfg.schedule == "constant":
        return optax.constant_schedule(base)
    if cfg.schedule == "cosine":
        return optax.cosine_decay_schedule(base, cfg.schedule_steps,
                                           alpha=cfg.min_lr_fraction)
    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=floor, peak_value=base,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.schedule_steps, end_value=floor)
    if cfg.schedule == "cyclical":
        half = max(1, cfg.schedule_steps // 2)
        return optax.join_schedules([
            optax.linear_schedule(floor, base, half),
            optax.linear_schedule(base, floor, half),
        ], boundaries=[half])
    raise ValueError(f"invalid schedule {cfg.schedule!r}")


def build_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """momentum(0.9) / rmsprop(0.9, 0.9) / adam + optional global-norm clip
    (reference ``train.py:111-134``), driven by the configured LR schedule."""
    schedule = build_schedule(cfg)
    if cfg.optimizer == "momentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.optimizer == "rmsprop":
        tx = optax.rmsprop(schedule, decay=cfg.rmsprop_decay,
                           momentum=cfg.rmsprop_momentum)
    elif cfg.optimizer == "adam":
        tx = optax.adam(schedule)
    else:
        raise ValueError(f"invalid optimizer {cfg.optimizer!r}")
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def _decoded_box_iou_sums(regr_targets: Array, regr_logits: Array,
                          anchor_maps: Array,
                          fg_mask: Array) -> Tuple[Array, Array]:
    """(Σ IoU·fg, Σ fg) of decoded predicted vs GT boxes on fg anchors — the
    metric the reference defines but leaves disabled (``train.py:137-161``).
    Sum-form so gradient-accumulation micro-batches combine exactly; the
    ratio is taken once per step.

    ``anchor_maps``: [N, 4] flattened per-anchor (cy, cx, h, w)."""
    def decode(regr):
        pos, log_size = jnp.split(regr, 2, axis=-1)
        a_pos, a_size = jnp.split(anchor_maps, 2, axis=-1)
        center = pos * a_size + a_pos
        size = jnp.exp(log_size) * a_size
        return box_ops.from_center_box(
            jnp.concatenate([center, size], axis=-1))

    iou = box_ops.iou(decode(regr_targets), decode(regr_logits))
    w = fg_mask.astype(jnp.float32)
    return jnp.sum(iou * w), jnp.sum(w)


# Canonical flat anchor table lives in ops/anchors.py; alias kept for the
# in-step metrics code below.
from retinanet_tpu.ops.anchors import flat_anchor_maps as _flat_anchor_maps


def make_train_step(model: RetinaNet, levels: Levels, config: Config,
                    with_metrics: bool = True):
    """Build the pure train-step function (to be jitted by the caller).

    ``with_metrics=False`` builds a hot-path variant that skips the
    full-tensor diagnostic reductions (prob histograms, IoU metrics,
    fg count) — those are worth ~40 masked reductions over [B, N, C]
    tensors per step, but are consumed only on the log cadence.  The
    Trainer compiles both variants and runs the full one only on steps
    whose metrics are actually written.  Both return the same state; the
    metrics dict differs in keys only.

    ``config.train.grad_accum > 1`` scans that many micro-batches per
    optimizer step (``lax.scan``) and averages their gradients — peak
    activation memory is one micro-batch's, so effective batches larger
    than one chip's HBM still train (the reference's answer was batch 1 on
    a Titan X, ``/root/reference/train.py:91``).  Diagnostics accumulate in
    sum-form across micro-batches (exactly batch-split invariant); loss
    scalars are means of per-micro-batch losses, matching
    ``optax.MultiSteps`` semantics.
    """
    num_classes = model.num_classes
    if config.model.quantize != "none":
        # int8 is a serving-only path: _int8_conv quantizes with round/clip
        # and no straight-through estimator, so conv-kernel gradients are
        # exactly zero — training would silently not learn.
        raise ValueError(
            f"model.quantize={config.model.quantize!r} is serving-only "
            "(quantized convs have zero gradients); train with "
            "quantize='none' and quantize at inference time")
    tx = build_optimizer(config.train)
    schedule = build_schedule(config.train)
    accum = max(1, config.train.grad_accum)
    _LOSS_KEYS = ("total_loss", "class_loss", "regr_loss",
                  "regularization_loss")

    def micro_fn(params, images: Array, boxes: Array, class_ids: Array,
                 box_mask: Array, dropout_rng: Array):
        """Loss gradient + sum-form metric accumulators over one
        (micro-)batch.  Everything returned combines across micro-batches
        by addition; ratios are taken once per optimizer step."""
        # Canvas comes from the batch itself (static at trace time), so the
        # same step function serves every bucket of a rectangular-bucket
        # pipeline — jit compiles one program per canvas shape.
        image_hw = images.shape[1:3]
        from retinanet_tpu.ops.preprocess import maybe_normalize
        images = maybe_normalize(images, config.data)
        # On-device label assignment, fused into the step.
        cls_t, regr_t, masks = assign.build_labels_batch(
            boxes, class_ids, box_mask, image_hw, levels, num_classes,
            config.assign)
        ct = flatten_levels(cls_t)
        rt = flatten_levels(regr_t)
        tm = flatten_levels(masks)

        def loss_fn(params):
            out = model.apply({"params": params}, images, training=True,
                              rngs={"dropout": dropout_rng})
            cl = flatten_levels(out["classifications"])
            rg = flatten_levels(out["regressions"])
            class_loss, regr_loss = detection_loss(
                ct, cl, rt, rg, tm, config.loss)
            reg_loss = l2_regularization(params, model.backbone,
                                         config.loss.weight_decay)
            total = class_loss + regr_loss + reg_loss
            return total, (class_loss, regr_loss, reg_loss, cl, rg)

        (total, (class_loss, regr_loss, reg_loss, cl, rg)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)

        sums = {"total_loss": total, "class_loss": class_loss,
                "regr_loss": regr_loss, "regularization_loss": reg_loss}
        if with_metrics:
            probs = jax.nn.sigmoid(cl)
            fg_mask = jnp.logical_and(jnp.max(ct, axis=-1) > 0.5, tm)
            anchor_maps = jnp.asarray(_flat_anchor_maps(levels, image_hw))
            inter, union = _class_iou_sums(ct, probs, tm)
            iou_sum, iou_w = _decoded_box_iou_sums(rt, rg, anchor_maps,
                                                   fg_mask)
            sums.update({
                "num_fg": jnp.sum(fg_mask.astype(jnp.int32)),
                "_class_inter": inter, "_class_union": union,
                "_regr_iou_sum": iou_sum, "_regr_iou_w": iou_w,
                **prob_histograms(ct, probs, tm),
            })
        return grads, sums

    def step_fn(state: TrainState, images: Array, boxes: Array,
                class_ids: Array, box_mask: Array,
                rng: Array) -> Tuple[TrainState, Dict[str, Array]]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        if accum == 1:
            grads, sums = micro_fn(state.params, images, boxes, class_ids,
                                   box_mask, dropout_rng)
        else:
            # Gradient accumulation: lax.scan over ``accum`` micro-batches,
            # each running its own fwd+bwd — peak activation memory is one
            # micro-batch's, so effective batches that exceed HBM fit on one
            # chip.  Gradients (and loss scalars) are averaged over the
            # micro-batches: identical semantics to optax.MultiSteps /
            # torch-style accumulation (for batch-coupled loss normalizers
            # — dice, focal's fg count — each micro-batch normalizes within
            # itself, exactly as N small optimizer-less steps would).
            b = images.shape[0]
            if b % accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum={accum}")
            mb = b // accum
            split = lambda x: x.reshape(accum, mb, *x.shape[1:])
            xs = (split(images), split(boxes), split(class_ids),
                  split(box_mask), jnp.arange(accum, dtype=jnp.uint32))

            def body(carry, x):
                g_acc, s_acc = carry
                mi, mbx, mids, mmask, i = x
                g, s = micro_fn(state.params, mi, mbx, mids, mmask,
                                jax.random.fold_in(dropout_rng, i))
                return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                        jax.tree_util.tree_map(jnp.add, s_acc, s)), None

            g_shapes, s_shapes = jax.eval_shape(
                micro_fn, state.params, xs[0][0], xs[1][0], xs[2][0],
                xs[3][0], dropout_rng)
            zeros = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, a.dtype), t)
            (g_sum, sums), _ = jax.lax.scan(
                body, (zeros(g_shapes), zeros(s_shapes)), xs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            # Loss scalars are means over micro-batches; metric
            # accumulators stay full-batch sums (ratios taken below).
            sums = {k: (v / accum if k in _LOSS_KEYS else v)
                    for k, v in sums.items()}

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)

        metrics = {k: sums[k] for k in _LOSS_KEYS}
        metrics.update({
            "grad_norm": optax.global_norm(grads),
            "learning_rate": schedule(state.step),
        })
        if with_metrics:
            metrics.update({
                "num_fg": sums["num_fg"],
                # Classmap mean IoU at threshold .5 (reference build_metrics).
                "class_iou": sums["_class_inter"] / jnp.maximum(
                    sums["_class_union"], 1.0),
                "regr_iou": sums["_regr_iou_sum"] / jnp.maximum(
                    sums["_regr_iou_w"], 1.0),
                "prob_fg_hist": sums["prob_fg_hist"],
                "prob_bg_hist": sums["prob_bg_hist"],
            })
        return new_state, metrics

    return step_fn


def _class_iou_sums(targets: Array, probs: Array,
                    mask: Array) -> Tuple[Array, Array]:
    """(intersection, union) sums of thresholded classmap vs targets over
    trainable anchors (reference ``train.py:149-152`` mean_iou with 2
    classes).  Sum-form for exact micro-batch accumulation."""
    pred = (probs > 0.5).astype(jnp.float32)
    w = mask.astype(jnp.float32)[..., None]
    inter = jnp.sum(pred * targets * w)
    union = jnp.sum(jnp.maximum(pred, targets) * w)
    return inter, union


def make_classmap_fn(model: RetinaNet, levels: Levels, config: Config):
    """jit: (params, images, boxes, ids, mask) → per-level (GT, predicted)
    fg-anchor-count maps [B, H, W] for the classmap heat overlays
    (reference ``train.py:52-66``: thresholded classmap at prob 0.5)."""

    def fn(params, images, boxes, class_ids, box_mask):
        from retinanet_tpu.ops.preprocess import maybe_normalize
        images = maybe_normalize(images, config.data)
        out = model.apply({"params": params}, images, training=False)
        cls_t, _, _ = assign.build_labels_batch(
            boxes, class_ids, box_mask, images.shape[1:3], levels,
            model.num_classes, config.assign)
        pred = {pn: jnp.sum(jax.nn.sigmoid(c) > 0.5, axis=(-2, -1))
                for pn, c in out["classifications"].items()}
        true = {pn: jnp.sum(t > 0.5, axis=(-2, -1))
                for pn, t in cls_t.items()}
        return true, pred

    return jax.jit(fn)


def create_train_state(model: RetinaNet, config: Config,
                       rng: Array) -> TrainState:
    """Init parameters + optimizer state.

    The model is fully convolutional — parameter shapes don't depend on the
    image size — so init uses a tiny 64px dummy: compiling the init program
    at full 640px costs ~13 minutes on TPU for nothing.
    """
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(rng, dummy, training=False)
    params = variables["params"]
    tx = build_optimizer(config.train)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state)


class CheckpointStore:
    """Experiment-directory checkpoint access, decoupled from the Trainer.

    The Trainer composes one for training; evaluate/export/detect construct
    one directly, so serving-side restores don't inherit training-only
    validations (e.g. global-batch divisibility against the mesh — a
    multi-host EVAL shards the *dataset* across processes, not the batch).
    Retention semantics match the reference Estimator's
    ``RunConfig(keep_checkpoint_max=5)`` (``/root/reference/train.py:263``,
    TF default): pruning keeps the newest N finalized ``step_N`` dirs and
    only ever runs after a save from THIS store — a restore-only store
    (evaluate) never prunes someone else's experiment.
    """

    def __init__(self, experiment: str, keep_checkpoints: int = 5,
                 is_lead: bool = True):
        self.experiment = experiment
        self.keep_checkpoints = keep_checkpoints
        self.is_lead = is_lead
        self._checkpointer = None
        self._saved = False

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(os.path.abspath(self.experiment), "checkpoints")

    def _ckpt(self):
        if self._checkpointer is None:
            import orbax.checkpoint as ocp
            self._checkpointer = ocp.StandardCheckpointer()
        return self._checkpointer

    def save(self, state: TrainState):
        """Async save (Orbax): returns immediately, I/O overlaps training.

        Retains only the newest ``keep_checkpoints`` completed checkpoints.
        Pruning happens AFTER the new save is dispatched and only touches
        finalized ``step_N`` directories (the in-flight async save is
        tmp-named until finalized), and it always retains the newest
        ``keep_checkpoints`` finalized ones — so even with
        ``keep_checkpoints=1`` a crash or a failed save mid-flight never
        leaves zero restorable checkpoints.
        """
        step = int(state.step)
        path = os.path.join(self.checkpoint_dir, f"step_{step}")
        self._ckpt().save(path, {"step": state.step, "params": state.params,
                                 "opt_state": state.opt_state}, force=True)
        self._saved = True
        logger.info("saving checkpoint at step %d", step)
        if self.is_lead:
            self._prune(keep=max(1, self.keep_checkpoints))

    def _finalized_steps(self) -> list:
        """Finalized step_N dirs on disk, ascending (no async wait — safe
        to call from pruning inside wait_for_checkpoints itself)."""
        if not os.path.isdir(self.checkpoint_dir):
            return []
        steps = []
        for name in os.listdir(self.checkpoint_dir):
            if name.startswith("step_") and "tmp" not in name:
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(steps)

    def _prune(self, keep: int):
        steps = self._finalized_steps()
        import shutil
        for step in steps[:-keep] if keep > 0 else steps:
            shutil.rmtree(
                os.path.join(self.checkpoint_dir, f"step_{step}"),
                ignore_errors=True)

    def wait_for_checkpoints(self):
        if self._checkpointer is not None:
            self._checkpointer.wait_until_finished()
            # Now that the in-flight save is finalized, enforce the exact
            # retention count (save-time pruning keeps one extra while the
            # newest save is still tmp-named).  Restore-only stores have
            # nothing in flight and must never prune.
            if self.is_lead and self._saved:
                self._prune(keep=max(1, self.keep_checkpoints))

    def checkpoint_steps(self) -> list:
        """All finalized checkpoint steps, ascending (waits for any
        in-flight async save first)."""
        self.wait_for_checkpoints()
        return self._finalized_steps()

    def latest_checkpoint_step(self) -> Optional[int]:
        steps = self.checkpoint_steps()
        return max(steps) if steps else None

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        explicit = step is not None
        step = step if step is not None else self.latest_checkpoint_step()
        if step is None:
            return state
        path = os.path.join(self.checkpoint_dir, f"step_{step}")
        if explicit and not os.path.isdir(path):
            available = self.latest_checkpoint_step()
            raise FileNotFoundError(
                f"no checkpoint at step {step} in {self.checkpoint_dir} "
                f"(latest available: {available})")
        template = {"step": state.step, "params": state.params,
                    "opt_state": state.opt_state}
        restored = self._ckpt().restore(path, template)
        logger.info("restored checkpoint from step %d", step)
        return TrainState(restored["step"], restored["params"],
                          restored["opt_state"])

    def restore_params(self, params, step: Optional[int] = None):
        """Params-only restore for SERVING (evaluate/export/detect).

        The full-tree ``restore`` needs a template whose ``opt_state``
        structure matches the checkpoint — which depends on the
        *training-time* optimizer config (e.g. ``--grad-clip-norm`` adds a
        clip element to the optax chain).  Serving doesn't know and must
        not care how the model was optimized, so this restores the
        ``params`` subtree alone via Orbax partial restore (round-5 bug:
        evaluating a clip-trained checkpoint crashed on the opt_state
        structure mismatch).
        """
        step = step if step is not None else self.latest_checkpoint_step()
        if step is None:
            return params
        path = os.path.join(self.checkpoint_dir, f"step_{step}")
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        try:
            restored = ckpt.restore(
                path, args=ocp.args.PyTreeRestore(item={"params": params},
                                                  partial_restore=True))
        finally:
            ckpt.close()
        logger.info("restored params from step %d", step)
        return restored["params"]


class Trainer:
    """Epoch loop + checkpoints + metrics (reference ``train.py:246-277``)."""

    def __init__(self, config: Config, loader=None):
        self.config = config
        if loader is None:
            loader = Inferred(config.data.dataset[0],
                              list(config.data.dataset[1:]))
        self.loader = loader
        self.levels = build_levels(config.anchors)
        self.model = RetinaNet.from_config(
            config.model, num_anchors=self.levels.num_anchors,
            num_classes=loader.num_classes)
        self.num_processes = jax.process_count()
        if config.train.grad_accum > 1 and (
                config.data.batch_size % config.train.grad_accum):
            raise ValueError(
                f"batch {config.data.batch_size} not divisible by "
                f"grad_accum={config.train.grad_accum}")
        if config.parallel.spatial > 1:
            # GSPMD spatial partitioning: image height sharded over the
            # mesh's space axis (see ParallelConfig).  Validate the static
            # geometry up front — every canvas height must split evenly
            # into bands, and the batch must divide the data axis.
            sp = config.parallel.spatial
            if self.num_processes > 1 and jax.local_device_count() % sp:
                # Multi-host spatial works when the space axis tiles within
                # each process's local devices: make_mesh lays devices out
                # (data, space) row-major in process order, so every space
                # group is then process-local — each process contributes
                # full-height image shards and the halo exchanges ride ICI,
                # never DCN.
                raise ValueError(
                    f"spatial={sp} must divide the local device count "
                    f"({jax.local_device_count()}) under multi-process "
                    "training")
            n_avail = config.parallel.num_devices or len(jax.devices())
            if n_avail % sp:
                raise ValueError(
                    f"{n_avail} devices not divisible by spatial={sp}")
            if config.data.batch_size % (n_avail // sp):
                raise ValueError(
                    f"batch {config.data.batch_size} not divisible by the "
                    f"data axis ({n_avail}//{sp} = {n_avail // sp} devices)")
            heights = ([h for h, _ in config.data.buckets]
                       if config.data.buckets else [config.data.image_size])
            for h in heights:
                if h % sp:
                    raise ValueError(
                        f"canvas height {h} not divisible by spatial={sp}")
        if self.num_processes > 1:
            # Multi-host: every process feeds only its slice of the global
            # batch from a disjoint shard of the dataset; the global array
            # is assembled in fit() (jax.make_array_from_process_local_data).
            if config.data.batch_size % self.num_processes:
                raise ValueError(
                    f"global batch {config.data.batch_size} not divisible "
                    f"by {self.num_processes} processes")
            # Buckets under multi-process use the pipeline's deterministic
            # canvas schedule: batch t's canvas is drawn from a shared
            # (train.seed, epoch)-seeded RNG on every process, so
            # make_array_from_process_local_data always assembles shards of
            # one agreed shape (data/pipeline.py:_scheduled_batches).
            n_avail = config.parallel.num_devices or len(jax.devices())
            n_data = n_avail // config.parallel.spatial
            if config.data.batch_size % n_data:
                raise ValueError(
                    f"global batch {config.data.batch_size} not divisible "
                    f"by the data axis ({n_data} devices)")
            self.mesh = make_mesh(config.parallel)
            if config.parallel.spatial > 1:
                # 2-D (data, space) mesh across processes: rebuild with the
                # FPN space hint (same as the single-process spatial branch)
                # so the backward has no partitioner-forced replication.
                self.model = RetinaNet.from_config(
                    config.model, num_anchors=self.levels.num_anchors,
                    num_classes=loader.num_classes, mesh=self.mesh)
            from retinanet_tpu.parallel.distributed import shard_loader
            pipeline_loader = shard_loader(loader, jax.process_index(),
                                           self.num_processes)
            local_data = dataclasses.replace(
                config.data,
                batch_size=config.data.batch_size // self.num_processes)
            # Shards differ by at most one sample when the dataset size is
            # not divisible by the process count; the pipeline drops the
            # final short batch, so batch counts per epoch can differ by one
            # across processes — the longer process would enter an extra
            # collective step and deadlock.  Cap every process at the
            # guaranteed minimum (smallest shard // local batch), computed
            # identically everywhere from the GLOBAL dataset length.
            try:
                min_shard = len(loader) // self.num_processes
                self._sync_steps_per_epoch = (
                    min_shard // local_data.batch_size)
            except TypeError:  # unsized loader: caller must set
                self._sync_steps_per_epoch = None  # steps_per_epoch
        elif config.parallel.spatial > 1:
            # Geometry validated above; no auto-shrink (band layout is
            # explicit user intent).
            self._sync_steps_per_epoch = None
            self.mesh = make_mesh(config.parallel)
            # Rebuild with the 2-D-mesh sharding hint (FPN.space_hint):
            # pins P6/P7 replicated over the space axis so the backward
            # has no partitioner-forced full rematerialization.
            self.model = RetinaNet.from_config(
                config.model, num_anchors=self.levels.num_anchors,
                num_classes=loader.num_classes, mesh=self.mesh)
            pipeline_loader, local_data = loader, config.data
        else:
            self._sync_steps_per_epoch = None
            # Mesh size must divide the global batch; auto-shrink like the
            # reference only enables MirroredStrategy when it fits
            # (train.py:261-262), preserving identical small-batch behaviour.
            n_avail = config.parallel.num_devices or len(jax.devices())
            n = n_avail
            while config.data.batch_size % n:
                n -= 1
            if n != n_avail:
                logger.warning(
                    "batch size %d not divisible by %d devices; using %d",
                    config.data.batch_size, n_avail, n)
            self.mesh = make_mesh(
                dataclasses.replace(config.parallel, num_devices=n))
            pipeline_loader, local_data = loader, config.data
        self.pipeline = build_pipeline(
            pipeline_loader, local_data, max_boxes=config.assign.max_boxes,
            training=True, seed=config.train.seed + jax.process_index(),
            scheduled_canvases=self.num_processes > 1,
            schedule_seed=config.train.seed)
        # Multi-process: every process participates in (Orbax) checkpoint
        # save/restore against the SHARED experiment directory, but only the
        # lead process writes metrics/images and prunes old checkpoints.
        self.is_lead = jax.process_index() == 0
        self.writer = (MetricsWriter(config.train.experiment)
                       if self.is_lead else None)
        self.checkpoints = CheckpointStore(config.train.experiment,
                                           config.train.keep_checkpoints,
                                           is_lead=self.is_lead)
        self._infer_fn = None

    # -- checkpointing (delegates to CheckpointStore) ------------------------
    @property
    def checkpoint_dir(self) -> str:
        return self.checkpoints.checkpoint_dir

    def save_checkpoint(self, state: TrainState):
        self.checkpoints.save(state)

    def wait_for_checkpoints(self):
        self.checkpoints.wait_for_checkpoints()

    def checkpoint_steps(self) -> list:
        return self.checkpoints.checkpoint_steps()

    def latest_checkpoint_step(self) -> Optional[int]:
        return self.checkpoints.latest_checkpoint_step()

    def restore_checkpoint(self, state: TrainState,
                           step: Optional[int] = None) -> TrainState:
        return self.checkpoints.restore(state, step)

    # -- image summaries -----------------------------------------------------
    def write_image_summaries(self, state: TrainState, batch: Batch):
        """GT vs predicted box overlays + classmap heat maps as PNGs
        (reference ``build_summary`` / ``draw_classmap``,
        ``train.py:52-85,164-187`` — rendered post-step on host instead of
        via an in-graph tf.py_func callback)."""
        try:
            import cv2
        except ImportError:
            return  # before any compile/device work: cv2-less hosts pay zero
        from retinanet_tpu.infer import make_inference_fn
        from retinanet_tpu.utils.draw import draw_bounding_boxes

        if self._infer_fn is None:
            self._infer_fn = make_inference_fn(
                self.model, self.levels, self.config)
            self._classmap_fn = make_classmap_fn(
                self.model, self.levels, self.config)
        n_draw = min(2, batch.images.shape[0])
        images_dev = jnp.asarray(batch.images[:n_draw])
        out = jax.device_get(self._infer_fn(state.params, images_dev))
        cm_true, cm_pred = jax.device_get(self._classmap_fn(
            state.params, images_dev,
            jnp.asarray(batch.boxes[:n_draw]),
            jnp.asarray(batch.class_ids[:n_draw]),
            jnp.asarray(batch.box_mask[:n_draw])))
        step = int(state.step)
        out_dir = os.path.join(self.config.train.experiment, "summaries",
                               f"step_{step}")
        os.makedirs(out_dir, exist_ok=True)
        mean = np.asarray(self.config.data.mean)
        std = np.asarray(self.config.data.std)
        names = self.loader.class_names
        from retinanet_tpu.utils.draw import draw_classmap

        def to_tb(tag, rgb):
            # Also stream into TensorBoard (Image summary, PNG-encoded) —
            # reference parity with tf.summary.image (train.py:168-187).
            if self.writer is None:
                return
            ok, png = cv2.imencode(".png", (rgb[..., ::-1]))
            if ok:
                self.writer.add_image_png(tag, png.tobytes(),
                                          rgb.shape[0], rgb.shape[1], step)

        for i in range(n_draw):
            if batch.images.dtype == np.uint8:  # device-normalized batches
                img = batch.images[i].astype(np.float32) / 255.0
            else:
                img = np.clip(batch.images[i] * std + mean, 0, 1)
            gt_valid = batch.box_mask[i]
            gt = draw_bounding_boxes(img, batch.boxes[i][gt_valid],
                                     batch.class_ids[i][gt_valid], names)
            cv2.imwrite(os.path.join(out_dir, f"{i}_true.png"),
                        gt[..., ::-1])
            to_tb(f"boxes/{i}_true", gt)
            pv = out.valid[i]
            pred = draw_bounding_boxes(img, out.boxes[i][pv],
                                       out.class_ids[i][pv], names,
                                       scores=out.scores[i][pv])
            cv2.imwrite(os.path.join(out_dir, f"{i}_pred.png"),
                        pred[..., ::-1])
            to_tb(f"boxes/{i}_pred", pred)
            # Per-level classmap heat overlays (reference train.py:52-66,
            # 176-187 — the author's main visual diagnostic): count of
            # fg anchor-class slots per cell, GT vs predicted.
            for pn in cm_true:
                heat_t = draw_classmap(img, np.asarray(cm_true[pn][i]))
                heat_p = draw_classmap(img, np.asarray(cm_pred[pn][i]))
                cv2.imwrite(
                    os.path.join(out_dir, f"{i}_classmap_{pn}_true.png"),
                    heat_t[..., ::-1])
                to_tb(f"classmap/{i}_{pn}_true", heat_t)
                cv2.imwrite(
                    os.path.join(out_dir, f"{i}_classmap_{pn}_pred.png"),
                    heat_p[..., ::-1])
                to_tb(f"classmap/{i}_{pn}_pred", heat_p)

    # -- training ----------------------------------------------------------
    def _device_batches(self, epoch: int):
        """(device_batch, host_batch) stream with one batch of transfer
        lookahead: batch k+1's host→device copy is issued before batch k is
        yielded, so the transfer overlaps the step running on batch k
        (double-buffered input; reference analog: ``prefetch(1)`` at
        ``train.py:202``)."""
        from retinanet_tpu.parallel.distributed import global_batch_from_local
        from retinanet_tpu.parallel.mesh import image_sharding
        img_sh, lbl_sh = image_sharding(self.mesh), batch_sharding(self.mesh)
        shardings = (img_sh, lbl_sh, lbl_sh, lbl_sh)
        pending = None
        for batch in self.pipeline.prefetched(epoch):
            db = global_batch_from_local(
                (batch.images, batch.boxes, batch.class_ids, batch.box_mask),
                self.mesh, shardings=shardings)
            if pending is not None:
                yield pending
            pending = (db, batch)
        if pending is not None:
            yield pending

    def fit(self, epochs: Optional[int] = None,
            steps_per_epoch: Optional[int] = None) -> TrainState:
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.train.epochs
        steps_per_epoch = (steps_per_epoch if steps_per_epoch is not None
                           else cfg.train.steps_per_epoch)
        if steps_per_epoch is None:
            # Multi-process: all processes must take the same number of
            # collective steps per epoch (see __init__).
            steps_per_epoch = self._sync_steps_per_epoch
        elif self._sync_steps_per_epoch is not None:
            steps_per_epoch = min(steps_per_epoch,
                                  self._sync_steps_per_epoch)

        rng = jax.random.PRNGKey(cfg.train.seed)
        state = create_train_state(self.model, cfg, rng)
        if cfg.train.init_backbone and self.latest_checkpoint_step() is None:
            # Fresh start only: a resumed checkpoint always wins over the
            # imported init (its backbone already trained past it).
            from retinanet_tpu.utils.pretrained import load_pretrained
            new_params, report = load_pretrained(
                state.params, cfg.train.init_backbone,
                backbone=cfg.model.backbone)
            state = state._replace(params=new_params)
            if report is not None:
                logger.info(
                    "init backbone from %s: %d by-name + %d by-shape "
                    "matches, 0 unmatched", cfg.train.init_backbone,
                    len(report["matched_by_name"]),
                    len(report["matched_by_shape"]))
            else:
                logger.info("init backbone from %s (exact npz restore)",
                            cfg.train.init_backbone)
        state = self.restore_checkpoint(state)
        py_step = int(state.step)  # host-side mirror: avoids a device sync
        # (int(state.step) blocks on the whole step program) per iteration

        from retinanet_tpu.parallel.mesh import image_sharding
        repl = replicated(self.mesh)
        data_sh = batch_sharding(self.mesh)
        img_sh = image_sharding(self.mesh)  # = data_sh on a 1-D mesh
        state = jax.device_put(state, repl)

        shardings = dict(
            in_shardings=(repl, img_sh, data_sh, data_sh, data_sh, repl),
            out_shardings=(repl, repl), donate_argnums=(0,))
        # Two compiled variants: the hot-path step skips the diagnostic
        # full-tensor reductions; the full step runs only on logged steps.
        jit_light = jax.jit(make_train_step(self.model, self.levels, cfg,
                                            with_metrics=False), **shardings)
        jit_full = jax.jit(make_train_step(self.model, self.levels, cfg,
                                           with_metrics=True), **shardings)

        step_rng = jax.device_put(jax.random.PRNGKey(cfg.train.seed + 1),
                                  repl)
        t_last = time.time()
        steps_since_log = 0  # actual steps elapsed since t_last: the first
        # logged step (step 1, which also pays compile) divides by 1, not
        # log_every, so metrics.jsonl never starts with a fabricated rate
        # Optional jax.profiler capture of N hot steps (train.profile_steps /
        # --profile N).  Starts 2 steps in, past the jit_full/jit_light
        # compile steps, so the trace holds steady-state device work only.
        # (The reference had no profiling; its author tuned blind.)
        profile_from = (py_step + 3 if cfg.train.profile_steps > 0
                        and self.is_lead else None)
        profile_dir = os.path.join(cfg.train.experiment, "profile")
        profiling = False
        import contextlib
        for epoch in range(epochs):
            logger.info("epoch %d", epoch)
            # closing(): a steps-per-epoch break must unwind the pipeline
            # generators deterministically (producer thread + worker pool),
            # not whenever GC notices — see Pipeline.prefetched (round-5
            # host-OOM fix).
            with contextlib.closing(self._device_batches(epoch)) as batches:
              for i, (device_batch, batch) in enumerate(batches):
                if steps_per_epoch is not None and i >= steps_per_epoch:
                    break
                step = py_step + 1
                if profile_from is not None and not profiling \
                        and step == profile_from:
                    jax.block_until_ready(state.params)
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                    logger.info("profiling %d steps -> %s",
                                cfg.train.profile_steps, profile_dir)
                # Log on cadence and always on the first step, so short runs
                # still produce metrics records.
                will_log = step % cfg.train.log_every == 0 or step == 1
                jitted = jit_full if will_log else jit_light
                state, metrics = jitted(state, *device_batch, step_rng)
                py_step = step
                steps_since_log += 1
                if profiling and step >= profile_from \
                        + cfg.train.profile_steps - 1:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_from = None

                if will_log and self.is_lead:
                    metrics = jax.device_get(metrics)
                    now = time.time()
                    metrics["images_per_sec"] = (
                        cfg.data.batch_size * steps_since_log
                        / max(now - t_last, 1e-9))
                    t_last = now
                    steps_since_log = 0
                    self.writer.write(step, metrics)
                    logger.info(
                        "step %d loss %.4f (class %.4f regr %.4f reg %.4f)",
                        step, float(metrics["total_loss"]),
                        float(metrics["class_loss"]),
                        float(metrics["regr_loss"]),
                        float(metrics["regularization_loss"]))
                if step % cfg.train.checkpoint_every == 0:
                    # Every process participates in the (multihost-
                    # coordinated) save; summaries are lead-only.
                    self.save_checkpoint(state)
                    if cfg.train.image_summaries and self.is_lead:
                        self.write_image_summaries(state, batch)
        if profiling:  # run ended inside the requested window
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
        self.save_checkpoint(state)
        self.wait_for_checkpoints()
        return state


def benchmark_train(config: Config, batch_size: int = 32, steps: int = 10,
                    warmup: int = 2, num_classes: int = 80) -> Dict[str, float]:
    """Full-train-step throughput (assignment + fwd + bwd + optimizer) on
    random data — the training-side companion to ``infer.benchmark``."""
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model, levels.num_anchors,
                                  num_classes=num_classes)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, levels, config,
                                      with_metrics=False),
                      donate_argnums=(0,))

    size = config.data.image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch_size, size, size, 3), jnp.float32)
    max_boxes = config.assign.max_boxes
    boxes = np.zeros((batch_size, max_boxes, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    boxes[:, 1] = [0.5, 0.4, 0.9, 0.8]
    mask = np.zeros((batch_size, max_boxes), bool)
    mask[:, :2] = True
    args = (jnp.asarray(boxes), jnp.zeros((batch_size, max_boxes), jnp.int32),
            jnp.asarray(mask), jax.random.PRNGKey(1))

    for _ in range(warmup):
        state, metrics = step_fn(state, images, *args)
    jax.device_get(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, images, *args)
    # device_get forces completion (block_until_ready is unreliable through
    # the remote-TPU tunnel; see infer.benchmark).
    jax.device_get(metrics["total_loss"])
    total = time.perf_counter() - t0
    return {
        "images_per_sec": batch_size * steps / total,
        "step_ms": total / steps * 1e3,
        "batch_size": batch_size,
        "image_size": size,
    }


def benchmark_train_pipeline(config: Config, batch_size: int = 32,
                             steps: int = 10, warmup: int = 2,
                             num_classes: int = 80,
                             num_images: Optional[int] = None
                             ) -> Dict[str, float]:
    """Train-step throughput with the LIVE host pipeline: in-memory shapes
    dataset → threaded decode/pad → uint8 transfer, double-buffered against
    the running step.  The synthetic-step bench (:func:`benchmark_train`)
    feeds the same device batch every step and so never measures host/
    transfer overlap; this is the end-to-end training number.

    ``num_classes`` defaults to 80 so the compute matches the headline
    bench (shapes only emits class ids 0-2; assignment is id-agnostic).
    """
    from retinanet_tpu.data.loaders.shapes import Shapes

    levels = build_levels(config.anchors)
    size = config.data.image_size
    loader = Shapes(None, num_images or max(batch_size * 4, 64),
                    (size, size))
    model = RetinaNet.from_config(config.model, levels.num_anchors,
                                  num_classes=num_classes)
    data_cfg = dataclasses.replace(config.data, batch_size=batch_size)
    pipeline = build_pipeline(loader, data_cfg,
                              max_boxes=config.assign.max_boxes,
                              training=True, seed=0)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, levels, config,
                                      with_metrics=False),
                      donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    def batches():
        epoch = 0
        while True:
            yield from pipeline.prefetched(epoch)
            epoch += 1

    def put(b: Batch):
        return (jnp.asarray(b.images), jnp.asarray(b.boxes),
                jnp.asarray(b.class_ids), jnp.asarray(b.box_mask))

    gen = batches()
    pending = put(next(gen))
    metrics = None
    for _ in range(warmup):
        nxt = put(next(gen))  # issue next transfer before stepping
        state, metrics = step_fn(state, *pending, rng)
        pending = nxt
    jax.device_get(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        nxt = put(next(gen))
        state, metrics = step_fn(state, *pending, rng)
        pending = nxt
    jax.device_get(metrics["total_loss"])
    total = time.perf_counter() - t0
    return {
        "images_per_sec": batch_size * steps / total,
        "step_ms": total / steps * 1e3,
        "batch_size": batch_size,
        "image_size": size,
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from retinanet_tpu.utils.cli import enable_compilation_cache
    enable_compilation_cache()
    config = config_from_args(argv)
    from retinanet_tpu.utils.cli import log_args
    log_args(config)
    trainer = Trainer(config)
    trainer.fit()


if __name__ == "__main__":
    main()
