"""Shared classification / regression subnets
(reference ``/root/reference/retinanet.py:24-115``).

Both heads: 4 × (3×3 conv 256 no-bias → GN → act), then a biased 3×3 output
conv reshaped to [B, H, W, A, K] / [B, H, W, A, 4].  The classification
output bias is initialized to ``-log((1-π)/π)`` with π=0.01
(``retinanet.py:52-53``) so initial fg probability ≈ π.  A single module
instance is applied to every pyramid level — Flax shares the parameters
across calls exactly like the reference's shared ``tf.layers`` subnets.

Logits are returned in float32 **when training**: the loss reductions are
precision-sensitive and this is the standard bf16-compute/fp32-logits
mixed-precision split.  At inference the native compute dtype (bf16) is
returned instead — the cast adds no precision (the convs accumulate in
bf16 regardless) but doubles the HBM traffic of the dense class volume,
which the decode stage then re-reads (measured 45 ms / 45 GB of the 265 ms
b128@640 pipeline before this split).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.models.layers import Conv, ConvGN, normal_001


class ClassificationSubnet(nn.Module):
    num_anchors: int
    num_classes: int
    channels: int = 256
    depth: int = 4
    activation: str = "elu"
    prior_prob: float = 0.01
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        for _ in range(self.depth):
            x = ConvGN(self.channels, kernel_size=3,
                       activation=self.activation, kernel_init=normal_001,
                       quantize=self.quantize,
                       dtype=self.dtype)(x, training=training)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        x = Conv(self.num_anchors * self.num_classes, kernel_size=3,
                 use_bias=True, kernel_init=normal_001, bias_init=bias_init,
                 dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, self.num_anchors, self.num_classes)
        return x.astype(jnp.float32) if training else x


class RegressionSubnet(nn.Module):
    num_anchors: int
    channels: int = 256
    depth: int = 4
    activation: str = "elu"
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        for _ in range(self.depth):
            x = ConvGN(self.channels, kernel_size=3,
                       activation=self.activation, kernel_init=normal_001,
                       quantize=self.quantize,
                       dtype=self.dtype)(x, training=training)
        x = Conv(self.num_anchors * 4, kernel_size=3, use_bias=True,
                 kernel_init=normal_001, dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, self.num_anchors, 4)
        return x.astype(jnp.float32) if training else x
