"""Fused ResNet bottleneck block for TPU serving (Pallas).

Round-3 profiling (NOTES: stage table) put the dense-ResNet-50 backbone at
75-78% HBM utilization — bandwidth-bound on the ~5 HBM passes per ConvGN
(conv write, GN stats read, GN affine read+write, next-conv read).  XLA
cannot shrink that byte count: GN statistics are a full-tensor reduction
between the conv and its consumer, so every ConvGN materializes twice.

This kernel runs ONE whole stride-1 identity bottleneck block
(``models/resnet.py:ResNetBottleneck``: 1×1 reduce → GN+relu → 3×3 →
GN+relu → 1×1 expand → GN → +identity → relu) per grid step with the whole
image resident in VMEM: HBM traffic collapses from ~11 tensor passes to
exactly 1 read of the block input + 1 write of the block output.  The
3×3 convolution is 9 shifted ``jnp.dot``s accumulated in fp32 (no im2col
materialization), GN moments are fp32 over the VMEM-resident activation,
and every intermediate is rounded to bf16 exactly where the XLA path
materializes bf16 — semantics match ``ConvGN``/``GroupNorm``
(reference ``/root/reference/resnet.py:84-101`` block structure,
``normalization.py:4-35`` GN) to bf16 accumulation-order tolerance.

Serving-only: no custom VJP — the module gates it on ``training=False``
(the XLA path remains the training implementation and the semantic
reference).  Only stride-1 non-projecting blocks qualify; projection /
downsampling blocks stay on XLA.

The round-2 lesson (NOTES: per-op Pallas GN lost in-model to layout
transposes around each pallas_call) is priced in: fusing the WHOLE block
amortizes the two boundary layouts over nine fused ops instead of one,
and the boundaries are plain NHWC bf16 tensors.  Adoption is decided by
an in-model A/B (``_profile_r3.py blockfuse``), not kernel-local timing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Group-count policy is owned by models/layers.resolve_groups — one
# definition for the XLA and fused paths, so they can never diverge.
from retinanet_tpu.models.layers import resolve_groups  # noqa: E402,F401


def _gn_act(y: Array, gamma: Array, beta: Array, groups: int, eps: float,
            relu: bool) -> Array:
    """GroupNorm + optional relu of a [M, C] activation, matching the XLA
    path bit-placement: stats in fp32 from the bf16-rounded activation,
    affine applied in bf16."""
    m, c = y.shape
    yb = y.astype(jnp.bfloat16)
    y32 = yb.astype(jnp.float32)
    # Everything stays >=2D (Mosaic has no 1D vector layout).
    s1 = jnp.sum(y32, axis=0, keepdims=True)    # [1, C]
    s2 = jnp.sum(y32 * y32, axis=0, keepdims=True)
    cg = c // groups
    # Group-sum + broadcast-back as two tiny matmuls against a 0/1
    # channel→group membership matrix.  Mosaic cannot lane-reshape
    # [1, C] → [G, C/G] ("infer-vector-layout: unsupported shape cast"
    # on real TPU; interpret mode accepted it), but 2-D iota and dots
    # lower fine, and HIGHEST keeps the f32 accumulation exact.
    ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch_of == grp).astype(jnp.float32)          # [C, G]
    gsum = lambda s: jnp.dot(
        jnp.dot(s, member, precision=jax.lax.Precision.HIGHEST),
        member.T, precision=jax.lax.Precision.HIGHEST)   # [1, C], per-group
    cnt = m * cg
    mean = gsum(s1) / cnt                                # [1, C]
    var = jnp.maximum(gsum(s2) / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                       # [1, C]
    gamma32 = gamma.astype(jnp.float32)                  # [1, C]
    beta32 = beta.astype(jnp.float32)
    scale = inv * gamma32
    shift = beta32 - mean * inv * gamma32
    out = yb * scale.astype(jnp.bfloat16) + shift.astype(jnp.bfloat16)
    if relu:
        out = jnp.maximum(out, 0)
    return out


def _block_kernel(x_ref, k1_ref, g1_ref, b1_ref, k2_ref, g2_ref, b2_ref,
                  k3_ref, g3_ref, b3_ref, out_ref, *, eps: float):
    _, h, w, c = x_ref.shape
    f = k1_ref.shape[-1]

    x = x_ref[0]                                 # [H, W, C] bf16
    xm = x.reshape(h * w, c)

    # 1×1 reduce → GN → relu.
    y1 = jnp.dot(xm, k1_ref[0, 0], preferred_element_type=jnp.float32)
    y1 = _gn_act(y1, g1_ref[:], b1_ref[:], resolve_groups(f), eps, True)

    # 3×3 SAME as 9 shifted dots accumulated in fp32 (no im2col buffer).
    padded = jnp.pad(y1.reshape(h, w, f), ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h * w, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = padded[dy:dy + h, dx:dx + w, :].reshape(h * w, f)
            acc = acc + jnp.dot(tap, k2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    y2 = _gn_act(acc, g2_ref[:], b2_ref[:], resolve_groups(f), eps, True)

    # 1×1 expand → GN → +identity → relu.
    y3 = jnp.dot(y2, k3_ref[0, 0], preferred_element_type=jnp.float32)
    y3 = _gn_act(y3, g3_ref[:], b3_ref[:], resolve_groups(c), eps, False)
    out = jnp.maximum(y3 + xm, 0)
    out_ref[0] = out.reshape(h, w, c)


def fused_bottleneck(x: Array, k1: Array, g1: Array, b1: Array,
                     k2: Array, g2: Array, b2: Array,
                     k3: Array, g3: Array, b3: Array,
                     eps: float = 1e-5, interpret: bool = False) -> Array:
    """One identity bottleneck block, whole-image-in-VMEM, one image per
    grid step.

    x [B,H,W,C] bf16; k1 [1,1,C,F]; k2 [3,3,F,F]; k3 [1,1,F,C];
    g*/b* the GN affines.  Returns bf16 [B,H,W,C].
    """
    b, h, w, c = x.shape
    f = k1.shape[-1]
    assert k3.shape[-1] == c and k2.shape == (3, 3, f, f)

    kernel = functools.partial(_block_kernel, eps=eps)
    to_bf16 = lambda a: a.astype(jnp.bfloat16)
    row2d = lambda a: a.reshape(1, -1).astype(jnp.float32)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    operands = (x.astype(jnp.bfloat16),
                to_bf16(k1), row2d(g1), row2d(b1),
                to_bf16(k2), row2d(g2), row2d(b2),
                to_bf16(k3), row2d(g3), row2d(b3))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))]
                 + [full(a) for a in operands[1:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        # Whole-image residency + fp32 stats temporaries exceed the 16 MB
        # default scoped-VMEM budget at res3 scale (measured: 25 MB needed
        # for [80,80,512]/f=128 at 640px).  v5e has 128 MB VMEM; raise the
        # kernel budget and let the in-model A/B decide adoption.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
