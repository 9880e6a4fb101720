"""DenseNet-BC 121/169 backbones (reference ``/root/reference/densenet.py``).

Pre-activation composite functions (GN → act → conv → dropout), concatenative
growth k=32, compression-0.5 transitions with average pooling.  Block depths:
121 → (6, 12, 24, 16); 169 → (6, 12, 32, 32).  C-level taps follow the
reference exactly (``densenet.py:246-262``): C2..C5 are taken *before* each
transition, so C5 carries raw pre-activation features (the "postprocess"
GN+act branch in ``retinanet.py:238-250`` is dead code — its guard tests the
literal string 'densenet' which is never a valid backbone choice — and is
deliberately not reproduced).

TPU note: each dense block is a static Python loop emitting ≤32 convs whose
inputs grow by concat; XLA handles the concats as fusion inputs, so no copy
materializes between composite functions.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.models.layers import (
    Conv, GroupNorm, avg_pool_same, max_pool_same)


class BottleneckComposite(nn.Module):
    """GN→act→1×1(4k)→drop→GN→act→3×3(k)→drop (``densenet.py:50-80``)."""

    growth_rate: int
    activation: str
    dropout_rate: float
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        x = GroupNorm(activation=self.activation, dtype=self.dtype)(x)
        x = Conv(self.growth_rate * 4, kernel_size=1,
                 quantize=self.quantize, dtype=self.dtype)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = GroupNorm(activation=self.activation, dtype=self.dtype)(x)
        x = Conv(self.growth_rate, kernel_size=3,
                 quantize=self.quantize, dtype=self.dtype)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x


class DenseBlock(nn.Module):
    """Concatenative growth block (``densenet.py:83-119``)."""

    growth_rate: int
    depth: int
    activation: str
    dropout_rate: float
    remat: bool = False
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        from retinanet_tpu.models.resnet import remat_call

        for _ in range(self.depth):
            composite = BottleneckComposite(
                self.growth_rate, self.activation, self.dropout_rate,
                quantize=self.quantize, dtype=self.dtype)
            out = remat_call(composite, x, training, self.remat)
            x = jnp.concatenate([x, out], axis=-1)
        return x


class TransitionLayer(nn.Module):
    """GN → 1×1 compress → dropout → avgpool/2 (``densenet.py:122-152``)."""

    compression_factor: float
    dropout_rate: float
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Array:
        filters = int(x.shape[-1] * self.compression_factor)
        x = GroupNorm(dtype=self.dtype)(x)
        x = Conv(filters, kernel_size=1, quantize=self.quantize,
                 dtype=self.dtype)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return avg_pool_same(x, 2, 2)


class DenseNetBC(nn.Module):
    """Returns {'C1'..'C5'} (reference ``DenseNetBC_ImageNet``)."""

    blocks: Tuple[int, int, int, int]
    growth_rate: int = 32
    compression_factor: float = 0.5
    activation: str = "elu"
    dropout_rate: float = 0.2
    remat: bool = False
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, training: bool = False) -> Dict[str, Array]:
        # Stem: 7×7/2 conv(2k) + GN + act → C1, then maxpool 3/2.
        x = Conv(2 * self.growth_rate, kernel_size=7, strides=2,
                 dtype=self.dtype)(x)
        x = GroupNorm(activation=self.activation, dtype=self.dtype)(x)
        taps = {"C1": x}
        x = max_pool_same(x, 3, 2)

        for i, depth in enumerate(self.blocks):
            x = DenseBlock(self.growth_rate, depth, self.activation,
                           self.dropout_rate, remat=self.remat,
                           quantize=self.quantize,
                           dtype=self.dtype)(x, training=training)
            taps[f"C{i + 2}"] = x
            if i < len(self.blocks) - 1:
                x = TransitionLayer(self.compression_factor,
                                    self.dropout_rate,
                                    quantize=self.quantize,
                                    dtype=self.dtype)(x, training=training)
        return taps


def DenseNetBC121(activation: str = "elu", dropout_rate: float = 0.2,
                  remat: bool = False, quantize: bool = False,
                  dtype: Any = jnp.bfloat16) -> DenseNetBC:
    return DenseNetBC(blocks=(6, 12, 24, 16), activation=activation,
                      dropout_rate=dropout_rate, remat=remat,
                      quantize=quantize, dtype=dtype)


def DenseNetBC169(activation: str = "elu", dropout_rate: float = 0.2,
                  remat: bool = False, quantize: bool = False,
                  dtype: Any = jnp.bfloat16) -> DenseNetBC:
    return DenseNetBC(blocks=(6, 12, 32, 32), activation=activation,
                      dropout_rate=dropout_rate, remat=remat,
                      quantize=quantize, dtype=dtype)
