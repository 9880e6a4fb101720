"""ResNeXt-50 (32×4d) backbone (reference ``/root/reference/resnet.py``).

The reference implements cardinality 32 as a Python loop of 32 small convs
over ``tf.split`` with a GroupNorm per split (``resnet.py:88-95``).  Here the
whole thing is **one** grouped convolution (``feature_group_count=32``) — the
form XLA tiles onto the MXU as a single op.  The per-split GroupNorms are
mathematically per-channel norms (each split has ≤32 channels, so
``min(32, c)`` makes every group a single channel), so the fused equivalent
is one GroupNorm with ``groups == channels``.

Reference quirks preserved: the downsampling identity projection is a 3×3
stride-2 conv, not the usual 1×1 (``resnet.py:33-36``); block-internal
activations are hard-coded relu regardless of the model activation
(``resnet.py:84-101``).
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.models.layers import Conv, ConvGN, GroupNorm, max_pool_same


def remat_call(block: nn.Module, x: Array, training: bool,
               enabled: bool) -> Array:
    """Per-block rematerialization: backward recomputes the block's forward
    instead of storing its intermediates.  Rematting the *call* (with
    ``training`` captured statically in the closure) keeps parameter paths
    identical to the non-remat model and keeps Python control flow on
    ``training`` (dropout's `deterministic`) static — rematting the class
    with ``static_argnums`` does neither."""
    if not enabled:
        return block(x, training=training)
    return nn.remat(lambda mdl, y: mdl(y, training=training))(block, x)


class ResNeXtBottleneck(nn.Module):
    """Grouped bottleneck (reference ``ResNeXt_Bottleneck``)."""

    filters: int  # stage width; conv1/conv2 = 2x, output = 4x
    project: Union[bool, str]  # False | True | 'down'
    cardinality: int = 32
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        identity = x
        if self.project == "down":
            # Reference quirk: 3×3/2 projection (resnet.py:33-36).
            identity = ConvGN(self.filters * 4, kernel_size=3, strides=2,
                              quantize=self.quantize,
                              dtype=self.dtype)(identity, training=training)
        elif self.project:
            identity = ConvGN(self.filters * 4, kernel_size=1,
                              quantize=self.quantize,
                              dtype=self.dtype)(identity, training=training)

        width = self.filters * 2
        x = ConvGN(width, kernel_size=1, activation="relu",
                   quantize=self.quantize,
                   dtype=self.dtype)(x, training=training)
        # Grouped 3×3: one conv replaces the reference's 32-conv Python loop;
        # gn_groups=width reproduces the per-split per-channel norms.
        strides = 2 if self.project == "down" else 1
        # Block-diagonal dense beats XLA's grouped lowering 1.6-2.6× on v5e
        # up to 512 channels (measured; at 1024 grouped wins back).
        x = Conv(width, kernel_size=3, strides=strides,
                 feature_group_count=self.cardinality,
                 grouped_as_dense=width <= 512,
                 quantize=self.quantize, dtype=self.dtype)(x)
        x = GroupNorm(groups=width, activation="relu",
                      dtype=self.dtype)(x)
        x = ConvGN(self.filters * 4, kernel_size=1, quantize=self.quantize,
                   dtype=self.dtype)(x, training=training)
        return jax.nn.relu(x + identity)


class ResNetBottleneck(nn.Module):
    """Standard dense bottleneck (1×1 reduce → 3×3 → 1×1 expand, v1.5:
    stride on the 3×3), GroupNorm + relu like the rest of the framework.

    Not in the reference — added because ResNeXt's 4-channel grouped convs
    utilize ~3% of the 128×128 MXU; dense 3×3 convs are the TPU-native
    flagship for the ResNet-50-FPN north-star benchmark (BASELINE.md).
    """

    filters: int
    project: Union[bool, str]
    quantize: bool = False
    fused: bool = False
    # Fused serving kernel for the stride-1 projection block
    # (ops/pallas/bottleneck.py:fused_bottleneck_proj); only meaningful on
    # the ``project is True`` block (res2 block 0).
    fused_proj: bool = False
    # H-strip rows for the fused kernel (0 = whole-image; see
    # ops/pallas/bottleneck.py:_strip_kernel).
    fused_strip_rows: int = 0
    # Training path: fused Pallas forward AND hand-fused backward
    # (ops/pallas/bottleneck_bwd.py custom_vjp) — the XLA-autodiff backward
    # is HBM-saturated (NOTES bwdprof) and this is the only formulation
    # that cuts its traffic.  Orthogonal to ``fused`` (the serving gate).
    fused_train: bool = False
    fused_bwd_strip_rows: int = 20
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        identity = x
        strides = 2 if self.project == "down" else 1
        # Instantiation order fixes the auto-numbered param names
        # (ConvGN_0 = projection when present) — keep it stable across the
        # fused and XLA paths so checkpoints are path-independent.
        projconv = None
        if self.project:
            projconv = ConvGN(self.filters * 4, kernel_size=1,
                              strides=strides, quantize=self.quantize,
                              dtype=self.dtype)
        conv1 = ConvGN(self.filters, kernel_size=1, activation="relu",
                       quantize=self.quantize, dtype=self.dtype)
        conv2 = ConvGN(self.filters, kernel_size=3, strides=strides,
                       activation="relu", quantize=self.quantize,
                       dtype=self.dtype)
        conv3 = ConvGN(self.filters * 4, kernel_size=1,
                       quantize=self.quantize, dtype=self.dtype)
        # Fused serving path: the whole identity block as one Pallas kernel
        # (1 HBM read + 1 write instead of ~11 tensor passes; see
        # ops/pallas/bottleneck.py).  Training and downsample blocks keep
        # the XLA path (the semantic reference); parameters are created
        # through the same modules either way, so checkpoints are
        # path-independent.
        fusable = (not self.quantize and not self.project
                   and self.dtype == jnp.bfloat16
                   and x.shape[-1] == self.filters * 4)
        # The stride-1 PROJECTION block (res2 block 0) has its own fused
        # serving kernel (the identity branch is GN(x·kp)); stride-2
        # "down" blocks stay on XLA (strided taps are a Mosaic relayout).
        proj_fusable = (not self.quantize and self.project is True
                        and self.dtype == jnp.bfloat16)
        interpret = jax.default_backend() != "tpu"
        # The hand-fused BACKWARD DMAs whole [H,W,C] planes from tiled HBM
        # buffers; Mosaic requires slice extents on the sublane (W) dim to
        # be 8-aligned, so res5 @640 (w=20) keeps XLA autodiff — it is the
        # smallest plane, so it carries the least of the HBM-traffic win
        # anyway (r4 mosaic bisection: "Slice shape along dimension 2 must
        # be aligned to tiling (8), but is 20").
        bwd_ok = x.shape[2] % 8 == 0
        if fusable and (self.fused and not training
                        or self.fused_train and training and bwd_ok):
            # Kernel shapes derive from each conv's *input* channel count.
            inner = jnp.zeros((1, 1, 1, self.filters), x.dtype)
            k1, g1, b1 = conv1(x, params_only=True)
            k2, g2, b2 = conv2(inner, params_only=True)
            k3, g3, b3 = conv3(inner, params_only=True)
            if training:
                from retinanet_tpu.ops.pallas.bottleneck_bwd import \
                    fused_bottleneck_train
                return fused_bottleneck_train(
                    x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
                    1e-5, interpret, self.fused_strip_rows,
                    self.fused_bwd_strip_rows)
            from retinanet_tpu.ops.pallas.bottleneck import fused_bottleneck
            return fused_bottleneck(
                x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
                interpret=interpret,
                strip_rows=self.fused_strip_rows)
        if proj_fusable and self.fused_proj and not training:
            inner = jnp.zeros((1, 1, 1, self.filters), x.dtype)
            kp, gp, bp = projconv(x, params_only=True)
            k1, g1, b1 = conv1(x, params_only=True)
            k2, g2, b2 = conv2(inner, params_only=True)
            k3, g3, b3 = conv3(inner, params_only=True)
            from retinanet_tpu.ops.pallas.bottleneck import \
                fused_bottleneck_proj
            return fused_bottleneck_proj(
                x, k1, g1, b1, k2, g2, b2, k3, g3, b3, kp, gp, bp,
                interpret=interpret,
                strip_rows=self.fused_strip_rows or 20)
        if projconv is not None:
            identity = projconv(identity, training=training)
        x = conv1(x, training=training)
        x = conv2(x, training=training)
        x = conv3(x, training=training)
        return jax.nn.relu(x + identity)


class ResNet50(nn.Module):
    """Dense ResNet-50 returning {'C1'..'C5'} — the MXU-friendly flagship
    (see :class:`ResNetBottleneck`).  Same stem/stage layout as ResNeXt50."""

    activation: str = "elu"
    dropout_rate: float = 0.0
    remat: bool = False
    quantize: bool = False
    fused_blocks: bool = False
    fused_res2: bool = False
    fused_res2_strips: int = 20
    # H-strips for fused res3+ blocks (0 = whole-image, the round-3 winner).
    fused_res3_strips: int = 0
    # H-strips for fused res4 blocks (0 = whole-image).
    fused_res4_strips: int = 0
    # Fused serving kernel for the stride-1 projection block (res2 b0).
    fused_proj: bool = False
    # Hand-fused Pallas backward for every identity block during training
    # (ops/pallas/bottleneck_bwd.py).
    fused_train: bool = False
    fused_bwd_strip_rows: int = 20
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Dict[str, Array]:
        # Stem stays unquantized: the 3-channel input conv is
        # bandwidth-bound and the most quantization-sensitive layer.
        x = ConvGN(64, kernel_size=7, strides=2, activation="relu",
                   dtype=self.dtype)(x, training=training)
        taps = {"C1": x}
        x = max_pool_same(x, 3, 2)

        stages = ((64, 3, False), (128, 4, True), (256, 6, True),
                  (512, 3, True))
        for stage_idx, (filters, depth, downsample) in enumerate(stages):
            for i in range(depth):
                project = ("down" if downsample else True) if i == 0 else False
                # res2 (filters=64) defaults to XLA: its 64-wide inner
                # matmuls underfill the 128×128 MXU and its 160×160×256
                # canvases are the largest whole-image VMEM residents.  But
                # it is also the MOST HBM-bound stage (NOTES stage table),
                # so fused_res2 makes it a separately measurable lever.
                block = ResNetBottleneck(filters=filters, project=project,
                                         quantize=self.quantize,
                                         fused=self.fused_blocks
                                               and (filters >= 128
                                                    or self.fused_res2),
                                         fused_proj=self.fused_proj,
                                         fused_strip_rows=(
                                             self.fused_res2_strips
                                             if filters == 64 else
                                             self.fused_res3_strips
                                             if filters == 128 else
                                             self.fused_res4_strips
                                             if filters == 256 else 0),
                                         fused_train=self.fused_train,
                                         fused_bwd_strip_rows=(
                                             self.fused_bwd_strip_rows),
                                         dtype=self.dtype)
                x = remat_call(block, x, training, self.remat)
            taps[f"C{stage_idx + 2}"] = x
        return taps


class ResNeXt50(nn.Module):
    """Returns {'C1'..'C5'} (reference ``ResNeXt_50``, ``resnet.py:169-215``).

    Stem 7×7/2 + GN + relu → C1; maxpool 3/2; stages of depth (3, 4, 6, 3)
    with widths (64, 128, 256, 512); stage 1 projects without downsampling.
    """

    activation: str = "elu"  # accepted for API parity; blocks use relu
    dropout_rate: float = 0.0  # reference ResNeXt has no dropout
    remat: bool = False
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Dict[str, Array]:
        x = ConvGN(64, kernel_size=7, strides=2, activation="relu",
                   dtype=self.dtype)(x, training=training)
        taps = {"C1": x}
        x = max_pool_same(x, 3, 2)

        stages = ((64, 3, False), (128, 4, True), (256, 6, True),
                  (512, 3, True))
        for stage_idx, (filters, depth, downsample) in enumerate(stages):
            for i in range(depth):
                project = ("down" if downsample else True) if i == 0 else False
                block = ResNeXtBottleneck(filters=filters, project=project,
                                          quantize=self.quantize,
                                          dtype=self.dtype)
                x = remat_call(block, x, training, self.remat)
            taps[f"C{stage_idx + 2}"] = x
        return taps
