"""Shared layers: GroupNorm, conv blocks, activations, initializers.

GroupNorm reproduces ``/root/reference/normalization.py:4-35`` exactly:
32 groups capped at the channel count (``groups = min(32, C)``), eps 1e-5,
per-channel γ/β, moments over (H, W, C/G).  Everything is NHWC.

TPU notes: convolutions lower to ``lax.conv_general_dilated`` which XLA tiles
onto the MXU; compute runs in bfloat16 with fp32 parameters and fp32 GN
statistics (the reduction is precision-sensitive).  The reference's Python
loop of 32 small ResNeXt convs (``resnet.py:88-95``) becomes one conv —
grouped, or block-diagonal dense where that is faster (``Conv.
grouped_as_dense``); depthwise convs use ``feature_group_count``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import Array

Dtype = Any

# Trace-time override: force grouped convs to keep their algorithmic
# feature_group_count even where ``grouped_as_dense`` would lower them to a
# block-diagonal dense conv.  Only analytic FLOP counting uses this
# (infer.forward_gflops_per_image) — the jaxpr of the dense lowering counts
# the deliberate 32x physical MACs, not what the model algorithmically needs.
_FORCE_TRUE_GROUPED = False


class force_true_grouped:
    """Context manager flipping :data:`_FORCE_TRUE_GROUPED` for a trace."""

    def __enter__(self):
        global _FORCE_TRUE_GROUPED
        _FORCE_TRUE_GROUPED = True

    def __exit__(self, *exc):
        global _FORCE_TRUE_GROUPED
        _FORCE_TRUE_GROUPED = False


# He-normal fan-in: reference variance_scaling_initializer(2.0, FAN_IN, normal)
# (resnet.py:193, densenet.py:268, mobilenet_v2.py:107).
he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# Head/FPN init: N(0, 0.01) (retinanet.py:303).
normal_001 = nn.initializers.normal(stddev=0.01)


def get_activation(name: str) -> Callable[[Array], Array]:
    """Activation registry (reference passes tf.nn.elu, train.py:213)."""
    return {
        "elu": jax.nn.elu,
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        "swish": jax.nn.swish,
        "gelu": jax.nn.gelu,
    }[name]


def resolve_groups(c: int, groups: int = 32) -> int:
    """Canonical GroupNorm group count: ``min(groups, c)`` then the largest
    divisor of ``c``.

    The reference reshapes to [n,h,w,G,C//G] without checking divisibility
    (``normalization.py:27``) — a latent runtime error for e.g.
    MobileNetV2's 144-channel expansions.  Every path that derives a group
    count (XLA GroupNorm here, the fused Pallas bottleneck kernel) MUST use
    this one helper so serving normalizes exactly as the checkpoint
    trained.
    """
    g = min(groups, c)
    while c % g:
        g -= 1
    return g


class GroupNorm(nn.Module):
    """Reference-exact GroupNorm (``normalization.py:4-35``), with an
    optional fused activation.

    ``groups`` is capped at the channel count; moments are computed in fp32
    over (H, W, C/G) per group.  The capping means channel counts below 32
    degrade towards InstanceNorm — the reference relies on this (e.g. the
    ResNeXt per-split norms are all effectively per-channel).

    A fused two-kernel Pallas implementation exists
    (``ops/pallas/groupnorm.py``: one streaming stats pass + one fused
    affine+activation pass) and wins 4-5× on *isolated* GN+ELU
    microbenchmarks — but measured **in-model** it costs ~2× XLA's fused GN
    (backbone 42→78 ms b32@640; XLA inserts layout transposes around each
    pallas_call, and its own conv-epilogue fusions already amortize most of
    the GN traffic).  It therefore stays opt-in (``use_pallas=True``); the
    jnp path below is the default and the semantic reference.
    """

    groups: int = 32
    eps: float = 1e-5
    activation: Optional[str] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, params_only: bool = False):
        n, h, w, c = x.shape
        groups = resolve_groups(c, self.groups)

        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        if params_only:
            # Create-and-return mode: fused whole-block kernels (e.g.
            # ops/pallas/bottleneck.py) consume the raw parameters while
            # keeping the parameter tree (and checkpoints) identical to the
            # unfused path.
            return gamma, beta

        # Fused path only where it pays: small tensors (<0.5 MB bf16) cost
        # ~nothing either way, and every distinct shape is a separate Mosaic
        # kernel compile.
        if self.use_pallas and h * w * c >= (1 << 18) \
                and jax.default_backend() == "tpu":
            from retinanet_tpu.ops.pallas.groupnorm import fused_group_norm_act
            out = fused_group_norm_act(x, gamma, beta, groups, self.eps,
                                       self.activation)
            return out.astype(self.dtype)

        # HBM-lean two-pass formulation (measured 1.2× backbone speedup over
        # the naive reshape-moments version): pass 1 reduces per-channel
        # sum / sum-of-squares in fp32 (one read of x), combines channels
        # into group moments on the tiny [n, g] result, and pass 2 applies a
        # per-channel affine in the compute dtype (one read + one write).
        # Mathematically identical to the reference's moments over
        # (H, W, C/G); var uses E[x²]−E[x]² in fp32, fine at activation
        # scales.
        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=(1, 2))              # [n, c]
        s2 = jnp.sum(jnp.square(x32), axis=(1, 2))  # [n, c]
        cnt = h * w * (c // groups)
        s1g = s1.reshape(n, groups, c // groups).sum(-1, keepdims=True)
        s2g = s2.reshape(n, groups, c // groups).sum(-1, keepdims=True)
        mean = s1g / cnt                            # [n, g, 1]
        var = jnp.maximum(s2g / cnt - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        gamma_g = gamma.reshape(groups, c // groups)[None]
        beta_g = beta.reshape(groups, c // groups)[None]
        # Keep the per-image affine RANK-2 [n, c] and expand it with an
        # explicit broadcast_in_dim (dims (0, 3)): under a 2-D (data,
        # space) mesh the partitioner tried to shard the size-1 dims of a
        # materialized [n,1,1,c] scale across the space axis in the
        # backward and fell into "involuntary full rematerialization"
        # (MULTICHIP_r03 tail).  A [:, None, None] broadcast still creates
        # that rank-4 intermediate in HLO; broadcast_in_dim from [n, c]
        # does not, so its transpose reduces straight to a batch-sharded
        # 2-D tensor (checked with _spatial_repro.py).
        scale = (inv * gamma_g).reshape(n, c)
        shift = (beta_g - mean * inv * gamma_g).reshape(n, c)
        # Apply in the input dtype: bf16 tensors stay bf16 through the
        # affine (one read + one write), fp32 tensors get exact math.
        bcast = lambda a: jax.lax.broadcast_in_dim(
            a.astype(x.dtype), x.shape, (0, 3))
        out = x * bcast(scale) + bcast(shift)
        if self.activation is not None:
            out = get_activation(self.activation)(out)
        return out.astype(self.dtype)


class Conv(nn.Module):
    """NHWC conv: bf16 compute, fp32 params, optional groups, optional
    int8 post-training quantization.

    ``quantize=True`` runs the convolution on the MXU's int8 path
    (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16): activations are quantized
    per-tensor (dynamic absmax), weights per-output-channel (symmetric),
    the conv accumulates in int32 and the epilogue dequantizes back to the
    compute dtype.  No calibration pass is needed; GroupNorm after every
    conv keeps activation scales well-behaved for dynamic quantization.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: str = "SAME"
    use_bias: bool = False
    feature_group_count: int = 1
    # Run a grouped conv as a DENSE conv with block-diagonal weights
    # (zeros off-block): mathematically identical (zero weights contribute
    # zero, and their gradients are masked back to zero), but measured
    # 1.6-2.6× faster than XLA's grouped-conv lowering on v5e for
    # cardinality-32 convs up to 512 channels — despite doing 32× the MACs.
    # The reference's ResNeXt (`resnet.py:88-95`) is the consumer.
    grouped_as_dense: bool = False
    kernel_init: Callable = he_normal
    bias_init: Callable = nn.initializers.zeros
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, params_only: bool = False):
        k = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        s = (self.strides,) * 2 if isinstance(self.strides, int) \
            else tuple(self.strides)
        kernel = self.param(
            "kernel", self.kernel_init,
            (*k, x.shape[-1] // self.feature_group_count, self.features),
            jnp.float32)
        if params_only:  # see GroupNorm.__call__
            return kernel
        groups = self.feature_group_count
        if self.grouped_as_dense and not _FORCE_TRUE_GROUPED and groups > 1 \
                and x.shape[-1] == self.features:
            cin, cg = x.shape[-1], kernel.shape[2]
            # dense[:, :, i, o] = kernel[:, :, i % cg, o] iff i//cg == o//cg.
            mask = (np.arange(cin)[:, None] // cg
                    == np.arange(self.features)[None, :] // cg)
            kernel = jnp.tile(kernel, (1, 1, groups, 1)) * mask
            groups = 1
        # Note: a 1×1-as-matmul formulation won isolated microbenchmarks
        # (1.2-1.6× at bottleneck shapes) but LOST in-model (+5 ms b32@640
        # forward) — the reshape forces relayouts XLA's conv path avoids.
        # Measured, rejected; the conv lowering is the fast path here.
        if self.quantize:
            y = _int8_conv(x, kernel, s, self.padding, groups, self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), s,
                self.padding,
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _int8_conv(x: Array, kernel: Array, strides, padding: str,
               feature_group_count: int, out_dtype: Dtype) -> Array:
    """s8×s8→s32 convolution with symmetric dynamic quantization.

    activations: per-tensor scale (absmax/127, computed on device — no
    calibration); weights: per-output-channel scale.  The int32 accumulator
    is exact; the only quantization error is the input rounding.
    """
    x32 = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                      1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding,
        feature_group_count=feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)


class ConvGN(nn.Module):
    """conv (no bias) → GroupNorm → optional activation → optional dropout.

    The reference's ubiquitous building block (conv + Normalization + act,
    e.g. ``retinanet.py:38-49``).  ``gn_groups`` defaults to 32; pass the
    channel count for the per-channel (InstanceNorm-degenerate) spots.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    feature_group_count: int = 1
    gn_groups: int = 32
    activation: Optional[str] = None
    dropout_rate: float = 0.0
    kernel_init: Callable = he_normal
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False,
                 params_only: bool = False):
        conv = Conv(self.features, self.kernel_size, self.strides,
                    feature_group_count=self.feature_group_count,
                    kernel_init=self.kernel_init, quantize=self.quantize,
                    dtype=self.dtype)
        gn = GroupNorm(groups=self.gn_groups, activation=self.activation,
                       dtype=self.dtype)
        if params_only:
            # Raw (kernel, gamma, beta) for fused whole-block kernels;
            # parameter names/shapes identical to the compute path.
            kernel = conv(x, params_only=True)
            gamma, beta = gn(jnp.zeros((1, 1, 1, self.features), x.dtype),
                             params_only=True)
            return kernel, gamma, beta
        x = conv(x)
        x = gn(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x


def max_pool_same(x: Array, window: int, strides: int) -> Array:
    """MaxPool with TF-style SAME padding (reference stem pools)."""
    return nn.max_pool(x, (window, window), (strides, strides), padding="SAME")


def avg_pool_same(x: Array, window: int, strides: int) -> Array:
    return nn.avg_pool(x, (window, window), (strides, strides), padding="SAME")


def nearest_upsample(x: Array, target_hw: Sequence[int]) -> Array:
    """Nearest-neighbour resize to ``target_hw`` (FPN top-down path,
    reference ``retinanet.py:154-156``).  For the usual exact 2× case this is
    a reshape-broadcast, which XLA fuses into the consumer."""
    n, h, w, c = x.shape
    th, tw = target_hw
    if th == 2 * h and tw == 2 * w:
        out = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        return out.reshape(n, th, tw, c)
    return jax.image.resize(x, (n, th, tw, c), method="nearest")
