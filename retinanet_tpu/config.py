"""Typed configuration for the whole framework.

The reference scatters its hyperparameters between argparse flags
(``/root/reference/train.py:88-108``) and hard-coded constants (anchor config
``levels.py:55-59``, IoU thresholds ``dataset.py:10-11``, loss mix
``losses.py:124-139``, L2 scales ``retinanet.py:304``, GN groups
``normalization.py:5``, NMS params ``utils.py:9,215``, optimizer coefficients
``train.py:115-117``, channel mean/std ``dataset.py:12-13``, shuffle buffer
``train.py:197``).  Here every one of them lives in a single frozen dataclass
so a run is fully described by one value, and jit sees only static Python
scalars.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor pyramid configuration (reference ``levels.py:55-59``).

    P3..P7 base sizes are ``32 * 2**(k-3)`` pixels; each cell gets
    ``len(aspect_ratios) * len(scale_ratios)`` anchors.
    """

    min_level: int = 3
    max_level: int = 7
    base_size: int = 32  # base anchor size at min_level, doubles per level
    aspect_ratios: Tuple[Tuple[float, float], ...] = ((1, 2), (1, 1), (2, 1))
    scale_ratios: Tuple[float, ...] = (2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3))

    @property
    def num_anchors(self) -> int:
        return len(self.aspect_ratios) * len(self.scale_ratios)

    @property
    def levels(self) -> Tuple[int, ...]:
        return tuple(range(self.min_level, self.max_level + 1))


@dataclasses.dataclass(frozen=True)
class AssignConfig:
    """Anchor→GT matching thresholds (reference ``dataset.py:10-11,83-87``).

    The reference has a quirk: background is assigned where
    ``iou < POS_IOU_THRESHOLD`` (``dataset.py:83`` — the 0.4 line is commented
    out) while the trainable (non-ignored) band is
    ``iou < 0.4 or iou >= 0.5``.  ``bg_uses_pos_threshold`` reproduces that
    behaviour (the default); set it False for the paper's 0.4 bg cut.
    """

    neg_iou_threshold: float = 0.4
    pos_iou_threshold: float = 0.5
    bg_uses_pos_threshold: bool = True
    max_boxes: int = 100  # static padding of per-image GT boxes
    # >0: anchor↔GT matching runs as a lax.scan over GT-box chunks of this
    # size (bit-exact vs the dense reduction).  Measured timing-PARITY with
    # the dense path at b16@640 (24.3 vs 25.0-25.6 ms, NOTES round 3): XLA
    # already fuses the [H,W,A,max_boxes] IoU into its reductions, so the
    # dense formulation stays the default; the knob remains for
    # memory-constrained configs with very large max_boxes.
    match_chunk: int = 0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss mix (reference ``losses.py``).

    ``class_losses`` selects which classification terms are summed; the
    reference's active config is ``('bce', 'dice')`` (``losses.py:124-139``),
    with focal implemented but disabled.  Regression is always Huber masked to
    foreground with SUM_BY_NONZERO_WEIGHTS semantics (``losses.py:144-152``).
    """

    class_losses: Tuple[str, ...] = ("bce", "dice")
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    dice_smooth: float = 0.0
    jaccard_smooth: float = 1.0
    huber_delta: float = 1.0
    weight_decay: float = 1e-4  # reference L2 regularizer scale retinanet.py:304


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model architecture (reference ``retinanet.py``)."""

    backbone: str = "resnet_50"  # resnet_50 | densenet_121 | densenet_169 | mobilenet_v2
    num_classes: int = 80
    activation: str = "elu"  # reference passes tf.nn.elu (train.py:213)
    dropout_rate: float = 0.2
    fpn_channels: int = 256
    head_depth: int = 4
    groupnorm_groups: int = 32  # normalization.py:5
    groupnorm_eps: float = 1e-5
    prior_prob: float = 0.01  # pi for classification bias init retinanet.py:52
    # TPU mixed precision: params fp32, compute bf16 (MXU-native).
    compute_dtype: str = "bfloat16"
    # Post-training-quantized serving: "int8" runs conv layers (except head
    # output convs and the stem) as s8×s8→s32 on the MXU with dynamic
    # per-tensor activation scales and per-channel weight scales.  Same
    # param tree as the float model — bf16-trained checkpoints load as-is.
    quantize: str = "none"  # none | int8
    # Rematerialize backbone blocks in the backward pass (trades ~30% extra
    # forward FLOPs for activation memory — enables larger train batches).
    remat: bool = False
    # Fused whole-bottleneck Pallas kernels for the dense ResNet backbone's
    # stride-1 identity blocks at serving time (ops/pallas/bottleneck.py:
    # one HBM read + one write per block instead of ~11 tensor passes).
    # Inference-only (training always takes the XLA path) and parameter-
    # compatible: checkpoints load identically either way.
    fused_blocks: bool = False
    # Extend block fusion to res2 (64-wide inner matmuls).  res2 is the
    # MOST HBM-bound stage in the profile (NOTES round-3 stage table:
    # 41 ms at 75-76% HBM util), but its matmuls quarter-fill the MXU and
    # its 160x160x256 images are the largest VMEM residents — so res2
    # fusion is a separate measured A/B lever, not implied by fused_blocks.
    fused_res2: bool = False
    # H-strip tiling for fused res2 blocks (rows per strip; 0 = whole-image
    # kernel).  res2's 160×160 canvases thrash as whole-image VMEM
    # residents — the strip kernel stages intermediates through two
    # [H,W,64]-bf16 scratch planes instead (ops/pallas/bottleneck.py:
    # _strip_kernel).  Other stages always use the whole-image kernel
    # (they fit, and it skips the conv3 recompute).
    fused_res2_strips: int = 20
    # H-strip tiling for fused res3+ blocks (0 = whole-image kernel, the
    # round-3 winner for those stages; >0 staged like res2 — a measurable
    # lever: the strip kernel trades a conv3 recompute for lower VMEM
    # residency, which can win when many 80×80×512 images contend).
    fused_res3_strips: int = 0
    # H-strip tiling for fused res4 blocks (0 = whole-image; res4's
    # 40×40×1024 planes are small VMEM residents, so whole-image is the
    # expected winner — the knob exists so the sweep can measure it).
    fused_res4_strips: int = 0
    # H-strips for the fused BACKWARD kernel (fused_train; rows per strip
    # in the 7-pass recompute+gradient pipeline of
    # ops/pallas/bottleneck_bwd.py).
    fused_bwd_strip_rows: int = 20
    # Fused serving kernel for the stride-1 PROJECTION block (res2 block
    # 0): identity branch GN(x·kp) folded into the same strip-tiled pass
    # structure (ops/pallas/bottleneck.py:fused_bottleneck_proj).  The
    # stride-2 "down" blocks stay on XLA — strided taps are a Mosaic
    # relayout (the stem-fusion lesson).
    fused_proj: bool = False
    # Hand-fused Pallas BACKWARD (plus fused forward) for identity blocks
    # during training (ops/pallas/bottleneck_bwd.py).  The XLA-autodiff
    # backbone backward is HBM-saturated (NOTES round-4 bwdprof:
    # 82-103% of roofline at 9-27% MFU) and remat ADDS traffic (-8%
    # measured); recomputing the forward inside VMEM is the only
    # formulation that cuts the byte count — ~3 image passes per block
    # (x, dout, dx) instead of XLA's ~12.
    fused_train: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (reference ``dataset.py`` / ``train.py:190-202``)."""

    dataset: Tuple[str, ...] = ("shapes", "/tmp/shapes", "100", "256")
    image_size: int = 640  # static square size (reference: dynamic shorter-side=scale)
    # Rectangular canvas buckets, e.g. ((640, 640), (640, 448), (448, 640)):
    # each image goes to the least-padding bucket, batches are
    # bucket-homogeneous, and jit compiles one train-step program per
    # bucket — recovers most of the padding FLOPs square canvases waste on
    # non-square datasets while keeping every shape static.  None = single
    # square canvas of image_size.
    buckets: Optional[Tuple[Tuple[int, int], ...]] = None
    batch_size: int = 8  # per-step global batch (reference: fixed 2 = img + flip)
    shuffle_buffer: int = 4096  # train.py:197
    augment_flip: bool = True
    # Reference-parity batch construction: the reference's "batch" is
    # always the stack of a sample and its horizontal flip
    # (``dataset.py:182-204`` — not random augmentation).  With this on,
    # every training sample contributes BOTH orientations as adjacent
    # batch entries (photometric/scale draws shared within the pair, so
    # the pair differs only by the flip); random flip is skipped.
    # batch_size must be even.  Default off: random flip sees 2× more
    # distinct images per batch at the same cost.
    pair_flip_batching: bool = False
    # Photometric augmentation — the reference stubs this out
    # (``dataset.py:206-212``); here it's a real capability: random
    # brightness / contrast / saturation jitter, host-side, before resize.
    augment_photometric: bool = False
    photometric_strength: float = 0.25  # max relative jitter per factor
    # Zoom-out scale jitter: each training image's resize factor is
    # multiplied by U[1-j, 1] (downscale only — boxes stay in-canvas, no
    # crop/clip semantics needed; static canvas unchanged).  0 = off.
    # Beyond the reference (its augmentation is flip-only +
    # "TODO: add augmentation", dataset.py:206-212).
    augment_scale_jitter: float = 0.0
    mean: Tuple[float, float, float] = (0.46618041, 0.44669811, 0.40252436)
    std: Tuple[float, float, float] = (0.27940595, 0.27489075, 0.28920765)
    # Ship training batches to the device as uint8 and normalize on-device:
    # 4× less host→device transfer (a 640px b32 batch is 157 MB as fp32,
    # 39 MB as uint8) and less host CPU.  The device-side normalize fuses
    # into the first conv's input read.
    transfer_uint8: bool = True
    num_workers: int = 4  # host-side decode threads (min(cpu,4) dataset.py:231)
    prefetch: int = 2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / schedule (reference ``train.py:88-134``)."""

    optimizer: str = "momentum"  # momentum | adam | rmsprop
    learning_rate: float = 1e-2  # train.py:90
    # LR schedule (reference: constant only, with a "try cyclical?" TODO at
    # train.py:44; all of these resolve that TODO).
    schedule: str = "constant"  # constant | cosine | warmup_cosine | cyclical
    warmup_steps: int = 500
    schedule_steps: int = 100_000  # horizon for cosine/cyclical
    min_lr_fraction: float = 0.01
    momentum: float = 0.9  # train.py:115
    rmsprop_decay: float = 0.9  # train.py:117
    rmsprop_momentum: float = 0.9
    grad_clip_norm: Optional[float] = None
    # Gradient accumulation: each optimizer step scans grad_accum
    # micro-batches of batch_size/grad_accum images and averages their
    # gradients — peak activation memory is one micro-batch's, so effective
    # batches that exceed one chip's HBM still fit (the TPU-native answer to
    # the reference's batch-1 Titan X ceiling, train.py:91).  Semantics
    # match optax.MultiSteps / torch-style accumulation.
    grad_accum: int = 1
    epochs: int = 1000
    steps_per_epoch: Optional[int] = None  # None = full pass over loader
    checkpoint_every: int = 500  # train.py:266-267
    # Retain only the newest N checkpoints (the reference's Estimator kept 5
    # by default; round-1 kept everything and ate the disk on long runs).
    keep_checkpoints: int = 5
    log_every: int = 50
    # Write GT/predicted box-overlay PNGs at every checkpoint (reference
    # build_summary, train.py:164-187).  Off by default: it runs an extra
    # forward+decode program.
    image_summaries: bool = False
    # Capture a jax.profiler trace of N hot steps (after the compile steps)
    # into <experiment>/profile — view with TensorBoard's profile plugin.
    # 0 = off.  The reference had no profiling at all.
    profile_steps: int = 0
    # Initialize the backbone from a weights file before step 0 (npz from
    # utils.pretrained.save_backbone, or a torch/torchvision state_dict —
    # .pt/.pth/.npz; layout-converted + name-mapped on import).  Ignored
    # when resuming from an experiment checkpoint.  The reference downloads
    # TF-slim resnet weights it never loads (download_weights.sh); this
    # makes the capability real.
    init_backbone: Optional[str] = None
    experiment: str = "experiments/default"
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    """Detection decode (reference ``utils.py:9,183-220``)."""

    score_threshold: float = 0.5  # utils.py:186 (prob > .5)
    iou_threshold: float = 0.5  # utils.py:215
    max_output_size: int = 1000  # NMS_MAX_OUTPUT_SIZE utils.py:9
    top_k_per_level: int = 1000  # static pre-NMS top-k (replaces boolean_mask)
    # Global cap on candidates entering NMS (across levels, after merging).
    # The reference has no such cap, but it also caps NMS *output* at 1000;
    # keeping only the top 1000 inputs deviates only when >1000 anchors score
    # above the 0.5 threshold.  Bounds the suppression loop's sequential work.
    pre_nms_top_k: int = 1000
    # Suppression backend: the Pallas kernel won in round 2's measurements,
    # but after the round-3 packed-key decode the vmapped fori_loop
    # fallback is faster at EVERY batch size tested (b1 33.8 vs 34.3 ms
    # p50; b32 416 vs 405 img/s; b128 538 vs 501) — the kernel batches
    # images on sublanes (≤8 per VMEM chunk) and serializes chunks.  Both
    # are bit-exact greedy NMS; the kernel stays available for
    # configurations where it wins again.
    use_pallas: bool = False
    # Suppression algorithm (both bit-exact greedy NMS).  "jacobi" replaces
    # the N-iteration fori_loop with fixed-point sweeps (one [B,N]×[B,N,N]
    # masked matvec per sweep, sweep count = longest suppression chain) —
    # but measured IN-MODEL it loses at the serving config (b128@640:
    # 533.4 vs 542.0 img/s; the per-sweep [B,N,N] HBM traffic costs more
    # than the fori_loop's serialization saves), so the sequential loop
    # stays the default.  Kept selectable: the trade reverses when the
    # matrix is small (latency configs) or chains are short.  Ignored when
    # use_pallas=True.
    suppression: str = "sequential"  # "sequential" | "jacobi"
    # TPU-native approximate top-k (jax.lax.approx_max_k) for the per-level
    # candidate selection: the TPU's partial-reduce sort unit is ~1.2×
    # faster than exact top_k on the big P3 map.  Only affects WHICH ~1000
    # candidates per level survive (recall_target fraction of the true
    # top-k is guaranteed); final NMS ordering stays exact, so detections
    # near the very bottom of the candidate list are the only deviation.
    use_approx_top_k: bool = False
    approx_top_k_recall: float = 0.95
    # Same approximation for the GLOBAL pre-NMS selection (merged levels →
    # pre_nms_top_k) in the fused serving path.  Separate opt-in from
    # use_approx_top_k because its mAP impact has not been revalidated the
    # way the per-level approximation has (NOTES round 3: per-level approx
    # measured mAP-neutral on shapes at both tested configs).
    use_approx_global_top_k: bool = False


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device mesh (replaces MirroredStrategy, reference ``train.py:261-262``).

    A 1-D data mesh is the reference-equivalent default; model code is
    mesh-agnostic so larger meshes are a config change.

    ``spatial`` > 1 adds a second mesh axis and shards the image HEIGHT
    across it (2-D ``(data, space)`` mesh): each device holds a horizontal
    band of every image in its batch shard, and XLA's SPMD partitioner
    inserts the conv halo exchanges and cross-band normalization reductions
    automatically (GSPMD spatial partitioning — the TPU-native way to fit
    high-resolution detection inputs that exceed one chip's HBM, with no
    manual ppermute halos).  Batch must divide ``num_devices // spatial``
    and every canvas height must divide ``spatial``.
    """

    data_axis: str = "data"
    space_axis: str = "space"
    num_devices: Optional[int] = None  # None = all visible devices
    spatial: int = 1  # devices along the space (image-height) axis


@dataclasses.dataclass(frozen=True)
class Config:
    anchors: AnchorConfig = dataclasses.field(default_factory=AnchorConfig)
    assign: AssignConfig = dataclasses.field(default_factory=AssignConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    nms: NMSConfig = dataclasses.field(default_factory=NMSConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def _apply_dotted(cfg: Config, dotted: str, value) -> Config:
    """Return a copy of ``cfg`` with ``section.field`` replaced by ``value``."""
    section_name, field_name = dotted.split(".", 1)
    section = getattr(cfg, section_name)
    section = dataclasses.replace(section, **{field_name: value})
    return dataclasses.replace(cfg, **{section_name: section})


def config_from_args(argv: Optional[Sequence[str]] = None) -> Config:
    """Build a Config from the reference-compatible CLI surface.

    Mirrors ``/root/reference/train.py:88-108``: --learning-rate --dropout
    --dataset --epochs --scale --experiment --grad-clip-norm --backbone
    --optimizer, plus TPU-native additions (--batch-size, --image-size alias
    of --scale, --steps-per-epoch, --seed).
    """
    import argparse

    parser = argparse.ArgumentParser(description="retinanet_tpu trainer")
    parser.add_argument("--learning-rate", type=float, default=1e-2)
    parser.add_argument("--dropout", type=float, default=0.2)
    parser.add_argument("--dataset", type=str, nargs="+", required=True)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--scale", type=int, default=600,
                        help="static square image size (reference shorter-side scale)")
    parser.add_argument("--experiment", type=str, required=True)
    parser.add_argument("--grad-clip-norm", type=float, default=None)
    parser.add_argument(
        "--backbone", type=str, default="resnet_50",
        choices=["resnet_50", "resnet_50_dense", "densenet_121",
                 "densenet_169", "mobilenet_v2"])
    parser.add_argument(
        "--optimizer", type=str, default="momentum",
        choices=["momentum", "adam", "rmsprop"])
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument(
        "--workers", type=int, default=None,
        help="host decode threads (default: min(cpu, 4), the reference's "
             "num_parallel_calls; raise on many-core TPU-VM hosts)")
    parser.add_argument(
        "--augment-photometric", action="store_true",
        help="random brightness/contrast/saturation jitter (host-side; "
             "the reference stubs this out)")
    parser.add_argument(
        "--augment-scale-jitter", type=float, default=0.0, metavar="J",
        help="zoom-out scale jitter: resize factor multiplied by U[1-J, 1] "
             "per training image (0 = off)")
    parser.add_argument(
        "--pair-flip-batching", action="store_true",
        help="reference-parity batches: each image contributes itself AND "
             "its horizontal flip as adjacent batch entries (the "
             "reference's deterministic batch construction, "
             "dataset.py:182-204) instead of random flip; batch size "
             "must be even")
    parser.add_argument(
        "--buckets", type=str, nargs="+", default=None, metavar="HxW",
        help="rectangular canvas buckets, e.g. --buckets 640x640 640x448 "
             "448x640; each image goes to the least-padding bucket and "
             "batches are bucket-homogeneous (one compiled program per "
             "bucket)")
    parser.add_argument(
        "--class-loss", type=str, nargs="+", default=None,
        choices=["bce", "focal", "dice", "jaccard", "fixed_iou",
                 "balanced_bce"],
        help="classification loss mix (default: bce dice, the reference's "
             "active config; 'focal' is the paper loss)")
    parser.add_argument(
        "--schedule", type=str, default="constant",
        choices=["constant", "cosine", "warmup_cosine", "cyclical"])
    parser.add_argument(
        "--warmup-steps", type=int, default=None, metavar="N",
        help="linear LR warmup length for --schedule warmup_cosine "
             "(default 500)")
    parser.add_argument(
        "--schedule-steps", type=int, default=None, metavar="N",
        help="decay horizon for cosine/warmup_cosine/cyclical schedules "
             "(default 100000; set to the planned optimizer-step count)")
    parser.add_argument(
        "--grad-accum", type=int, default=1, metavar="A",
        help="accumulate gradients over A micro-batches per optimizer step "
             "(batch-size must divide by A); fits effective batches larger "
             "than one chip's HBM")
    parser.add_argument(
        "--spatial", type=int, default=1, metavar="S",
        help="shard image height over S devices (2-D (data, space) mesh; "
             "GSPMD spatial partitioning for inputs too large for one "
             "chip's HBM). Devices and canvas heights must divide S")
    parser.add_argument(
        "--platform", type=str, default=None, metavar="NAME",
        help="pin JAX to a platform (e.g. 'cpu') in-process; the "
             "JAX_PLATFORMS env var is unreliable under platform plugins "
             "that register at import time")
    parser.add_argument(
        "--init-backbone", type=str, default=None, metavar="PATH",
        help="initialize the backbone from a weights file (save_backbone "
             "npz or a torch/torchvision state_dict) when starting fresh; "
             "ignored on checkpoint resume")
    parser.add_argument(
        "--fused-train", action="store_true",
        help="hand-fused Pallas backward (and fused forward) for the dense "
             "ResNet's identity bottleneck blocks during training — cuts "
             "the HBM-saturated backbone backward to ~3 image passes per "
             "block (dense ResNet backbones only)")
    parser.add_argument(
        "--profile", type=int, default=0, metavar="N",
        help="capture a jax.profiler trace of N hot train steps into "
             "<experiment>/profile (TensorBoard profile plugin)")
    args = parser.parse_args(argv)

    # Process-level side effect, applied here so it lands before any
    # device use by the caller (train.main builds the Trainer right after).
    from retinanet_tpu.utils.cli import force_platform
    force_platform(args.platform)

    cfg = Config()
    for dotted, value in [
        ("train.learning_rate", args.learning_rate),
        ("model.dropout_rate", args.dropout),
        ("data.dataset", tuple(args.dataset)),
        ("train.epochs", args.epochs),
        ("data.image_size", args.scale),
        ("train.experiment", args.experiment),
        ("train.grad_clip_norm", args.grad_clip_norm),
        ("model.backbone", args.backbone),
        ("train.optimizer", args.optimizer),
        ("data.batch_size", args.batch_size),
        ("train.steps_per_epoch", args.steps_per_epoch),
        ("train.seed", args.seed),
        ("train.schedule", args.schedule),
        ("train.log_every", args.log_every),
        ("train.profile_steps", args.profile),
        ("data.pair_flip_batching", bool(args.pair_flip_batching)),
        ("data.augment_photometric", bool(args.augment_photometric)),
        ("data.augment_scale_jitter", args.augment_scale_jitter),
        ("parallel.spatial", args.spatial),
        ("train.grad_accum", args.grad_accum),
        ("train.init_backbone", args.init_backbone),
        ("model.fused_train", bool(args.fused_train)),
    ]:
        cfg = _apply_dotted(cfg, dotted, value)
    if args.workers is not None:
        cfg = _apply_dotted(cfg, "data.num_workers", args.workers)
    if args.warmup_steps is not None:
        cfg = _apply_dotted(cfg, "train.warmup_steps", args.warmup_steps)
    if args.schedule_steps is not None:
        cfg = _apply_dotted(cfg, "train.schedule_steps", args.schedule_steps)
    if args.class_loss is not None:
        cfg = _apply_dotted(cfg, "loss.class_losses", tuple(args.class_loss))
    if args.buckets is not None:
        cfg = _apply_dotted(cfg, "data.buckets", parse_buckets(args.buckets))
    return cfg


def parse_buckets(specs) -> Tuple[Tuple[int, int], ...]:
    """Parse ``["640x640", "640x448", ...]`` HxW specs (the --buckets CLI
    surface, shared by train and evaluate)."""
    buckets = []
    for spec in specs:
        h, w = spec.lower().split("x")
        buckets.append((int(h), int(w)))
    return tuple(buckets)
