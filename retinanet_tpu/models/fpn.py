"""Feature Pyramid Network (reference ``/root/reference/retinanet.py:118-221``).

P6 = 3×3/2 conv(C5)+GN; P7 = 3×3/2 conv(act(P6))+GN; P5 = 1×1(C5)+GN;
P4/P3 via lateral 1×1 + nearest-neighbour upsample + add + 3×3 merge, all at
``channels`` (256) width with N(0, 0.01) init.  The 2× upsample lowers to a
reshape-broadcast XLA fuses into the add.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from retinanet_tpu.models.layers import (
    ConvGN, get_activation, nearest_upsample, normal_001)


class UpsampleMerge(nn.Module):
    """lateral 1×1+GN; upsample; add; 3×3 merge+GN (``retinanet.py:121-160``)."""

    channels: int = 256
    quantize: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, lateral: Array, downsampled: Array, *,
                 training: bool = False) -> Array:
        lateral = ConvGN(self.channels, kernel_size=1,
                         kernel_init=normal_001, quantize=self.quantize,
                         dtype=self.dtype)(lateral, training=training)
        downsampled = nearest_upsample(downsampled, lateral.shape[1:3])
        merged = lateral + downsampled
        return ConvGN(self.channels, kernel_size=3, kernel_init=normal_001,
                      quantize=self.quantize,
                      dtype=self.dtype)(merged, training=training)


class FPN(nn.Module):
    """{'C3','C4','C5'} → {'P3'..'P7'} (reference ``retinanet.py:163-221``).

    ``space_hint`` (optional callable, set only under a 2-D (data, space)
    mesh) pins the deepest levels' sharding: P6/P7 feature maps are 1-4
    pixels tall at typical scales — the space axis has nothing to shard —
    and without the hint the SPMD partitioner falls into "involuntary full
    rematerialization" bridging their backward cotangents between dgrad
    and wgrad layouts (MULTICHIP_r03 tail).  The tensors are tiny, so the
    constraint costs nothing in the forward.
    """

    channels: int = 256
    activation: str = "elu"
    quantize: bool = False
    space_hint: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c: Dict[str, Array], *,
                 training: bool = False) -> Dict[str, Array]:
        act = get_activation(self.activation)
        hint = self.space_hint if self.space_hint is not None else (
            lambda x: x)
        p6 = hint(ConvGN(self.channels, kernel_size=3, strides=2,
                         kernel_init=normal_001, quantize=self.quantize,
                         dtype=self.dtype)(hint(c["C5"]), training=training))
        p7 = hint(ConvGN(self.channels, kernel_size=3, strides=2,
                         kernel_init=normal_001, quantize=self.quantize,
                         dtype=self.dtype)(act(p6), training=training))
        p5 = ConvGN(self.channels, kernel_size=1, kernel_init=normal_001,
                    quantize=self.quantize,
                    dtype=self.dtype)(c["C5"], training=training)
        p4 = UpsampleMerge(self.channels, quantize=self.quantize,
                           dtype=self.dtype)(c["C4"], p5, training=training)
        p3 = UpsampleMerge(self.channels, quantize=self.quantize,
                           dtype=self.dtype)(c["C3"], p4, training=training)
        return {"P3": p3, "P4": p4, "P5": p5, "P6": p6, "P7": p7}
