"""MobileNetV2 backbone (reference ``/root/reference/mobilenet_v2.py``).

Faithful to the reference's variant, which differs from the paper:
GroupNorm (+ dropout) after every conv, a configurable activation instead of
relu6, and a custom **32-wide** 1×1 output conv producing C5
(``mobilenet_v2.py:178-185``) instead of the usual 1280.

TPU-native differences: the hand-rolled ``tf.nn.depthwise_conv2d`` layer
(``mobilenet_v2.py:15-38``) becomes a grouped ``lax`` conv via
``feature_group_count == channels``, which XLA lowers to a native depthwise
convolution.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.models.layers import Conv, ConvGN, GroupNorm

# (filters, expansion, stride, repeats) per stage — mobilenet_v2.py:119-176.
_STAGES = (
    (16, 1, 1, 1),
    (24, 6, 2, 2),
    (32, 6, 2, 3),
    (64, 6, 2, 4),
    (96, 6, 1, 3),
    (160, 6, 2, 3),
    (320, 6, 1, 1),
)


class Bottleneck(nn.Module):
    """Inverted residual (reference ``mobilenet_v2.py:41-96``)."""

    filters: int
    strides: int
    expansion: int
    activation: str
    dropout_rate: float
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        identity = x
        in_ch = x.shape[-1]

        # expand 1×1 → GN → act → dropout
        x = ConvGN(in_ch * self.expansion, kernel_size=1,
                   activation=self.activation, dropout_rate=self.dropout_rate,
                   quantize=self.quantize,
                   dtype=self.dtype)(x, training=training)
        # depthwise 3×3 → GN → act → dropout
        ch = x.shape[-1]
        # Depthwise convs stay unquantized: they're bandwidth-bound (no
        # MXU win) and per-channel dynamics make them quant-sensitive.
        x = Conv(ch, kernel_size=3, strides=self.strides,
                 feature_group_count=ch, dtype=self.dtype)(x)
        x = GroupNorm(activation=self.activation, dtype=self.dtype)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        # linear 1×1 → GN → dropout (no activation)
        x = ConvGN(self.filters, kernel_size=1, activation=None,
                   dropout_rate=self.dropout_rate, quantize=self.quantize,
                   dtype=self.dtype)(x, training=training)

        if x.shape == identity.shape:
            x = x + identity
        return x


class MobileNetV2(nn.Module):
    """Returns {'C1'..'C5'} feature maps (reference ``mobilenet_v2.py:189-223``)."""

    activation: str = "elu"
    dropout_rate: float = 0.2
    remat: bool = False
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Dict[str, Array]:
        from retinanet_tpu.models.resnet import remat_call

        x = ConvGN(32, kernel_size=3, strides=2, activation=self.activation,
                   dropout_rate=self.dropout_rate,
                   dtype=self.dtype)(x, training=training)

        taps: Dict[str, Array] = {}
        # C-level taps after stages 1, 2, 3, 5 (reference call: C4 is taken
        # after bottleneck_5_3, i.e. stage index 4 here).
        tap_after_stage = {0: "C1", 1: "C2", 2: "C3", 4: "C4"}
        for i, (filters, expansion, stride, repeats) in enumerate(_STAGES):
            for r in range(repeats):
                block = Bottleneck(
                    filters=filters, strides=stride if r == 0 else 1,
                    expansion=expansion, activation=self.activation,
                    dropout_rate=self.dropout_rate, quantize=self.quantize,
                    dtype=self.dtype)
                x = remat_call(block, x, training, self.remat)
            if i in tap_after_stage:
                taps[tap_after_stage[i]] = x

        # Custom 32-wide output conv → C5 (mobilenet_v2.py:178-185).
        x = ConvGN(32, kernel_size=1, activation=self.activation,
                   dropout_rate=self.dropout_rate,
                   dtype=self.dtype)(x, training=training)
        taps["C5"] = x
        return taps
