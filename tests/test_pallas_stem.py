"""Fused stem epilogue kernel (ops/pallas/stem.py) vs the XLA/flax path.

The kernel fuses GN-affine + relu + 3x3/2 SAME maxpool into one VMEM pass
(the stem measured 13.2 ms at 10% MFU b128@640 — NOTES round-3 stage
table).  Interpret mode on CPU; same bf16 rounding points as the model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.models.layers import (ConvGN, GroupNorm, max_pool_same)
from retinanet_tpu.ops.pallas.stem import fused_stem, gn_relu_maxpool


def test_gn_relu_maxpool_matches_xla():
    """Affine+relu+pool vs flax ops, odd strip tail (h2=10, strips of 4)."""
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 20, 16, 8
    y = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    scale = jnp.asarray(rng.rand(b, c) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(b, c) * 0.1, jnp.float32)

    ref = jnp.maximum(
        y * scale[:, None, None].astype(jnp.bfloat16)
        + shift[:, None, None].astype(jnp.bfloat16), 0)
    ref = max_pool_same(ref, 3, 2)

    out = gn_relu_maxpool(y, scale, shift, strip_rows=4, interpret=True)
    assert out.shape == (b, h // 2, w // 2, c)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_fused_stem_matches_convgn_pool():
    """Full stem (conv+GN+relu+pool) vs the model's ConvGN+max_pool path."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.bfloat16)
    stem = ConvGN(16, kernel_size=7, strides=2, activation="relu")
    params = stem.init(jax.random.PRNGKey(0), x, training=False)["params"]
    # Randomize GN affine so the test is not identity-affine trivial.
    params = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(rng.randn(*p.shape) * 0.05, p.dtype)
        if p.ndim == 1 else p, params)
    ref = max_pool_same(
        stem.apply({"params": params}, x, training=False), 3, 2)

    out = fused_stem(x, params["Conv_0"]["kernel"],
                     params["GroupNorm_0"]["gamma"],
                     params["GroupNorm_0"]["beta"], interpret=True)
    assert out.shape == ref.shape
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    np.testing.assert_allclose(r, o, rtol=2e-2, atol=2e-2)
    assert (r == o).mean() > 0.98  # same rounding points -> mostly bitwise
