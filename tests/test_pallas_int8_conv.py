"""Pallas int8 3x3 conv (ops/pallas/int8_conv.py) vs the XLA int8 path.

The kernel must reproduce ``models/layers._int8_conv`` (same per-tensor /
per-channel symmetric quantization, exact s32 accumulation) — the s32
accumulator is exact, so differences can only come from the fp epilogue
rounding order; on identical quantized operands the integer part matches
bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.models.layers import _int8_conv
from retinanet_tpu.ops.pallas.int8_conv import int8_conv3x3


def test_int8_conv3x3_matches_xla_int8():
    rng = np.random.RandomState(0)
    b, h, w, c, f = 2, 12, 9, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, c, f) * 0.1, jnp.float32)

    ref = _int8_conv(x, kern, (1, 1), "SAME", 1, jnp.bfloat16)
    out = int8_conv3x3(x, kern, strip_rows=5, interpret=True)  # ragged tail
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    np.testing.assert_allclose(r, o, rtol=2e-2, atol=2e-2)
    assert (r == o).mean() > 0.97  # same s32 integers, same bf16 target


def test_int8_conv3x3_bias_and_relu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)

    base = _int8_conv(x, kern, (1, 1), "SAME", 1, jnp.float32)
    ref = jnp.maximum(base + bias, 0).astype(jnp.bfloat16)
    out = int8_conv3x3(x, kern, bias=bias, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(out, np.float32) >= 0)
