"""RetinaNet assembly (reference ``/root/reference/retinanet.py:224-316``).

backbone → FPN → shared classification/regression subnets applied to each of
P3..P7.  Output pytree: ``{'classifications': {P3..P7: [B,H,W,A,K]},
'regressions': {P3..P7: [B,H,W,A,4]}}`` — the dict-of-levels shape is a
natural JAX pytree and flows through jit/vmap/shard_map unchanged.

The reference's in-graph L2 regularization (``retinanet.py:304``) is instead
computed from the param pytree by :func:`l2_regularization` with the same
per-module scales (backbones 1e-4, MobileNetV2 4e-5 — ``resnet.py:193``,
``mobilenet_v2.py:108``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.config import ModelConfig
from retinanet_tpu.models.densenet import DenseNetBC121, DenseNetBC169
from retinanet_tpu.models.fpn import FPN
from retinanet_tpu.models.heads import ClassificationSubnet, RegressionSubnet
from retinanet_tpu.models.mobilenet_v2 import MobileNetV2
from retinanet_tpu.models.resnet import ResNet50, ResNeXt50

BACKBONES = ("resnet_50", "resnet_50_dense", "densenet_121", "densenet_169",
             "mobilenet_v2")


def build_backbone(name: str, activation: str, dropout_rate: float,
                   dtype: Any = jnp.bfloat16,
                   remat: bool = False, quantize: bool = False,
                   fused_blocks: bool = False,
                   fused_res2: bool = False,
                   fused_res2_strips: int = 20,
                   fused_res3_strips: int = 0,
                   fused_res4_strips: int = 0,
                   fused_proj: bool = False,
                   fused_train: bool = False,
                   fused_bwd_strip_rows: int = 20) -> nn.Module:
    """Reference ``retinanet.py:12-21`` (resnet_50 is ResNeXt-50 there too);
    ``resnet_50_dense`` is the TPU-native dense-conv flagship addition."""
    if name == "resnet_50":
        return ResNeXt50(activation=activation, remat=remat,
                         quantize=quantize, dtype=dtype)
    if name == "resnet_50_dense":
        return ResNet50(activation=activation, remat=remat,
                        quantize=quantize, fused_blocks=fused_blocks,
                        fused_res2=fused_res2,
                        fused_res2_strips=fused_res2_strips,
                        fused_res3_strips=fused_res3_strips,
                        fused_res4_strips=fused_res4_strips,
                        fused_proj=fused_proj,
                        fused_train=fused_train,
                        fused_bwd_strip_rows=fused_bwd_strip_rows,
                        dtype=dtype)
    if name == "densenet_121":
        return DenseNetBC121(activation=activation, dropout_rate=dropout_rate,
                             remat=remat, quantize=quantize, dtype=dtype)
    if name == "densenet_169":
        return DenseNetBC169(activation=activation, dropout_rate=dropout_rate,
                             remat=remat, quantize=quantize, dtype=dtype)
    if name == "mobilenet_v2":
        return MobileNetV2(activation=activation, dropout_rate=dropout_rate,
                           remat=remat, quantize=quantize, dtype=dtype)
    raise ValueError(f"unknown backbone {name!r}; choose from {BACKBONES}")


class RetinaNet(nn.Module):
    """Full detector.  Construct via ``RetinaNet.from_config(cfg.model)``."""

    backbone: str = "resnet_50"
    num_classes: int = 80
    num_anchors: int = 9
    activation: str = "elu"
    dropout_rate: float = 0.2
    fpn_channels: int = 256
    head_depth: int = 4
    prior_prob: float = 0.01
    remat: bool = False
    # int8 post-training-quantized serving: conv layers (except the head
    # output convs and the stem) run s8xs8->s32 on the MXU (v5e: 394 TOPS
    # int8 vs 197 TFLOP/s bf16).  Same parameter tree as the float model, so
    # bf16-trained checkpoints load directly.
    quantize: bool = False
    # Fused whole-bottleneck Pallas serving kernels for the dense ResNet
    # backbone (ops/pallas/bottleneck.py); inference-only, param-compatible.
    fused_blocks: bool = False
    fused_res2: bool = False
    fused_res2_strips: int = 20
    fused_res3_strips: int = 0
    fused_res4_strips: int = 0
    fused_proj: bool = False
    # Hand-fused Pallas backward for dense-ResNet identity blocks during
    # training (ops/pallas/bottleneck_bwd.py).
    fused_train: bool = False
    fused_bwd_strip_rows: int = 20
    # Sharding hint for the deepest FPN levels under a 2-D (data, space)
    # mesh (see FPN.space_hint).  Built by from_config(mesh=...) / the
    # Trainer's spatial path; None on 1-D meshes.
    space_hint: Any = None
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_config(cls, cfg: ModelConfig, num_anchors: int = 9,
                    num_classes: int = None, mesh=None) -> "RetinaNet":
        space_hint = None
        if mesh is not None and len(mesh.axis_names) > 1:
            from retinanet_tpu.parallel.mesh import space_replicated_hint
            space_hint = space_replicated_hint(mesh)
        return cls(
            space_hint=space_hint,
            backbone=cfg.backbone,
            num_classes=cfg.num_classes if num_classes is None else num_classes,
            num_anchors=num_anchors,
            activation=cfg.activation,
            dropout_rate=cfg.dropout_rate,
            fpn_channels=cfg.fpn_channels,
            head_depth=cfg.head_depth,
            prior_prob=cfg.prior_prob,
            remat=cfg.remat,
            quantize=cfg.quantize == "int8",
            fused_blocks=cfg.fused_blocks,
            fused_res2=cfg.fused_res2,
            fused_res2_strips=cfg.fused_res2_strips,
            fused_res3_strips=cfg.fused_res3_strips,
            fused_res4_strips=cfg.fused_res4_strips,
            fused_proj=cfg.fused_proj,
            fused_train=cfg.fused_train,
            fused_bwd_strip_rows=cfg.fused_bwd_strip_rows,
            dtype=jnp.dtype(cfg.compute_dtype))

    def setup(self):
        self.backbone_net = build_backbone(
            self.backbone, self.activation, self.dropout_rate, self.dtype,
            remat=self.remat, quantize=self.quantize,
            fused_blocks=self.fused_blocks, fused_res2=self.fused_res2,
            fused_res2_strips=self.fused_res2_strips,
            fused_res3_strips=self.fused_res3_strips,
            fused_res4_strips=self.fused_res4_strips,
            fused_proj=self.fused_proj,
            fused_train=self.fused_train,
            fused_bwd_strip_rows=self.fused_bwd_strip_rows)
        self.fpn = FPN(channels=self.fpn_channels, activation=self.activation,
                       quantize=self.quantize, space_hint=self.space_hint,
                       dtype=self.dtype)
        # Heads stay float under int8 serving: fp32-safe logits/regression
        # is the principled serving split, and XLA's int8 conv lowering
        # yields no compensating speedup anyway (NOTES.md).  Measured
        # ablations on shapes: quantize-everything 0.6922 mAP, minus heads
        # 0.6925, minus FPN too 0.6901 (float 0.7048) — the ~0.013 drop is
        # intrinsic to backbone PTQ with dynamic per-tensor scales, AP50
        # unchanged in all variants.
        self.classification_subnet = ClassificationSubnet(
            num_anchors=self.num_anchors, num_classes=self.num_classes,
            channels=self.fpn_channels, depth=self.head_depth,
            activation=self.activation, prior_prob=self.prior_prob,
            dtype=self.dtype)
        self.regression_subnet = RegressionSubnet(
            num_anchors=self.num_anchors, channels=self.fpn_channels,
            depth=self.head_depth, activation=self.activation,
            dtype=self.dtype)

    def __call__(self, images: Array, *,
                 training: bool = False) -> Dict[str, Dict[str, Array]]:
        x = images.astype(self.dtype)
        bottom_up = self.backbone_net(x, training=training)
        top_down = self.fpn(
            {k: bottom_up[k] for k in ("C3", "C4", "C5")}, training=training)
        # Shared heads: the same bound submodule applied per level reuses one
        # parameter set (reference retinanet.py:283-291).
        classifications = {
            k: self.classification_subnet(v, training=training)
            for k, v in top_down.items()}
        regressions = {
            k: self.regression_subnet(v, training=training)
            for k, v in top_down.items()}
        return {"classifications": classifications, "regressions": regressions}


def l2_regularization(params, backbone: str, scale: float = 1e-4) -> Array:
    """TF-parity L2 loss: ``scale * sum(w**2) / 2`` over conv kernels.

    tf.contrib's ``l2_regularizer(scale)`` contributes ``scale *
    tf.nn.l2_loss(w)`` per kernel; MobileNetV2 uses scale 4e-5
    (``mobilenet_v2.py:108``), everything else 1e-4.  GroupNorm γ/β and
    biases are not regularized (the reference registers regularizers only on
    conv kernels).
    """
    from collections.abc import Mapping

    backbone_scale = 4e-5 if backbone == "mobilenet_v2" else scale

    def walk(tree, in_backbone):
        total = jnp.zeros((), jnp.float32)
        for key, value in tree.items():
            inside = in_backbone or key == "backbone_net"
            if isinstance(value, Mapping):
                total += walk(value, inside)
            elif key == "kernel":
                s = backbone_scale if inside else scale
                total += s * jnp.sum(
                    jnp.square(value.astype(jnp.float32))) / 2
        return total

    return walk(params, False)
