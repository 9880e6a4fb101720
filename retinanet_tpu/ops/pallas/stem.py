"""Fused stem epilogue: GroupNorm-affine + relu + 3x3/2 SAME maxpool.

The flagship stem (7x7/2 conv + GN + relu + maxpool; reference
``resnet.py:146-153``) measured 13.2 ms of the 241 ms b128@640 serving
step at only 10% MFU / 50% HBM utilization — XLA materializes the
[320,320,64] conv output through the GN/relu/pool chain several times.
This kernel collapses everything after the conv into ONE read of the conv
output and one write of the pooled result:

    conv (XLA, MXU)  ->  per-channel GN scale/shift (XLA reduce, tiny)
                     ->  pallas: relu(y*scale+shift) + 3x3/2 maxpool

Key trick: the strided 3x3/2 window never needs strided slicing inside the
kernel (Mosaic dislikes it) — maxpool is SEPARABLE, and an even/odd
row-pair reshape turns stride-2 taps into plain slices:

    z[2i+dy] for dy in {0,1,2}  ==  {even[i], odd[i], even[i+1]}

Padding note: TF-SAME maxpool pads with -inf, but this kernel runs on
relu output (>= 0), so zero-padding is exactly equivalent (a window is
never all padding).

The 7x7/2 conv itself stays on XLA's conv path: its input is 3-channel
NHWC whose 3-lane minor dimension is hostile to VMEM value layouts, and
XLA's implicit-GEMM conv handles it at full HBM rate already.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinanet_tpu.models.layers import resolve_groups


def _gn_pool_kernel(y_ref, scale_ref, shift_ref, out_ref, *, strips):
    """One image per grid step: y [1,H,W,C] bf16 -> out [1,H2,W2,C].

    ``strips`` are static (r0, r1) OUTPUT-row ranges; each reads input
    rows [2*r0, 2*r1 + 1) and applies affine+relu then the separable
    stride-2 max."""
    _, h, w, c = y_ref.shape
    _, h2, w2, _ = out_ref.shape
    scale = scale_ref[0].astype(jnp.bfloat16)   # block [1, 1, C] -> [1, C]
    shift = shift_ref[0].astype(jnp.bfloat16)
    for r0, r1 in strips:
        rs = r1 - r0
        lo, hi = 2 * r0, min(2 * r1 + 1, h)
        z = y_ref[0, lo:hi].reshape((hi - lo) * w, c)
        n = jnp.maximum(z * scale + shift, 0).reshape(hi - lo, w, c)
        # Pad rows to exactly 2*rs+2 (bottom halo may be off-image) and
        # cols to even W+2 — zeros are identity under max on relu output.
        n = jnp.pad(n, ((0, 2 * rs + 2 - (hi - lo)), (0, 2), (0, 0)))
        pairs = n.reshape(rs + 1, 2, w + 2, c)
        ev, od = pairs[:, 0], pairs[:, 1]
        m1 = jnp.maximum(jnp.maximum(ev[:rs], od[:rs]), ev[1:rs + 1])
        cols = m1.reshape(rs, (w + 2) // 2, 2, c)
        cev, cod = cols[:, :, 0], cols[:, :, 1]
        out_ref[0, r0:r1] = jnp.maximum(
            jnp.maximum(cev[:, :w2], cod[:, :w2]), cev[:, 1:w2 + 1])


def fused_stem(x: Array, w: Array, gamma: Array, beta: Array,
               eps: float = 1e-5, interpret: bool = False) -> Array:
    """Full stem: XLA 7x7/2 conv -> XLA GN moments -> fused affine+relu+
    maxpool.  Matches layers.GroupNorm's fp32 stats-from-bf16 semantics."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    n, h, wd, c = y.shape
    groups = resolve_groups(c)
    y32 = y.astype(jnp.float32)
    s1 = jnp.sum(y32, axis=(1, 2))                # [n, c]
    s2 = jnp.sum(jnp.square(y32), axis=(1, 2))
    cnt = h * wd * (c // groups)
    s1g = s1.reshape(n, groups, c // groups).sum(-1, keepdims=True)
    s2g = s2.reshape(n, groups, c // groups).sum(-1, keepdims=True)
    mean = s1g / cnt
    var = jnp.maximum(s2g / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gamma_g = gamma.reshape(groups, c // groups)[None]
    beta_g = beta.reshape(groups, c // groups)[None]
    scale = (inv * gamma_g).reshape(n, c)
    shift = (beta_g - mean * inv * gamma_g).reshape(n, c)
    return gn_relu_maxpool(y, scale, shift, interpret=interpret)


def gn_relu_maxpool(y: Array, scale: Array, shift: Array,
                    strip_rows: int = 20,
                    interpret: bool = False) -> Array:
    """relu(y*scale+shift) + 3x3/2 SAME maxpool in ONE VMEM pass, with
    PER-IMAGE [B, C] scale/shift rows (GroupNorm statistics are
    per-image).  Returns bf16 [B, H/2, W/2, C]."""
    b, h, w, c = y.shape
    h2, w2 = h // 2, w // 2
    strips = tuple((r0, min(r0 + strip_rows, h2))
                   for r0 in range(0, h2, strip_rows))
    kernel = functools.partial(_gn_pool_kernel, strips=strips)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
                  # [B, 1, C] with a (1, 1, C) block: every block dim is
                  # either 1-for-1 with the grid or equal to the full
                  # array dim (Mosaic's sublane/lane divisibility rule).
                  pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c), jnp.bfloat16),
        # Whole-image residency ([320,320,64] bf16 = 13 MB in, 3.2 MB out,
        # double-buffered) exceeds the 16 MB default scoped-VMEM budget;
        # v5e has 128 MB VMEM (same raise as ops/pallas/bottleneck.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(y.astype(jnp.bfloat16),
      scale.reshape(b, 1, c).astype(jnp.float32),
      shift.reshape(b, 1, c).astype(jnp.float32))
