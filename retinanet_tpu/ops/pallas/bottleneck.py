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


def _gn_partial_stats(yb: Array):
    """Per-channel fp32 (sum, sum-of-squares) of a bf16 [M, C] slab —
    the strip-accumulable half of the GN moments."""
    y32 = yb.astype(jnp.float32)
    # Everything stays >=2D (Mosaic has no 1D vector layout).
    s1 = jnp.sum(y32, axis=0, keepdims=True)    # [1, C]
    s2 = jnp.sum(y32 * y32, axis=0, keepdims=True)
    return s1, s2


def _group_sum(s: Array, groups: int) -> Array:
    """Per-channel [1, C] → per-channel [1, C] where each channel holds its
    GROUP's sum.  Group-sum + broadcast-back as two tiny matmuls against a
    0/1 channel→group membership matrix.  Mosaic cannot lane-reshape
    [1, C] → [G, C/G] ("infer-vector-layout: unsupported shape cast" on
    real TPU; interpret mode accepted it), but 2-D iota and dots lower
    fine, and HIGHEST keeps the f32 accumulation exact."""
    c = s.shape[-1]
    cg = c // groups
    ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch_of == grp).astype(jnp.float32)          # [C, G]
    return jnp.dot(
        jnp.dot(s, member, precision=jax.lax.Precision.HIGHEST),
        member.T, precision=jax.lax.Precision.HIGHEST)   # [1, C], per-group


def _gn_moments(s1: Array, s2: Array, m: int, groups: int, eps: float):
    """Per-channel fp32 (mean, inv-std) [1, C] from per-channel
    (sum, sum-of-squares) over ``m`` rows."""
    c = s1.shape[-1]
    cnt = m * (c // groups)
    mean = _group_sum(s1, groups) / cnt                  # [1, C]
    var = jnp.maximum(_group_sum(s2, groups) / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                       # [1, C]
    return mean, inv


def _gn_scale_shift(s1: Array, s2: Array, m: int, gamma: Array, beta: Array,
                    groups: int, eps: float):
    """Finalize GN moments from per-channel sums over ``m`` rows into the
    per-channel bf16 (scale, shift) of the fused affine
    ``out = yb * scale + shift``."""
    mean, inv = _gn_moments(s1, s2, m, groups, eps)
    gamma32 = gamma.astype(jnp.float32)                  # [1, C]
    beta32 = beta.astype(jnp.float32)
    scale = inv * gamma32
    shift = beta32 - mean * inv * gamma32
    return scale.astype(jnp.bfloat16), shift.astype(jnp.bfloat16)


def _gn_act(y: Array, gamma: Array, beta: Array, groups: int, eps: float,
            relu: bool) -> Array:
    """GroupNorm + optional relu of a [M, C] activation, matching the XLA
    path bit-placement: stats in fp32 from the bf16-rounded activation,
    affine applied in bf16."""
    m, _ = y.shape
    yb = y.astype(jnp.bfloat16)
    s1, s2 = _gn_partial_stats(yb)
    scale, shift = _gn_scale_shift(s1, s2, m, gamma, beta, groups, eps)
    out = yb * scale + shift
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


def _strip_kernel(x_ref, k1_ref, g1_ref, b1_ref, k2_ref, g2_ref, b2_ref,
                  k3_ref, g3_ref, b3_ref, out_ref, y1_scr, y2_scr, *,
                  eps: float, strips):
    """Strip-tiled variant of ``_block_kernel``: same block, same bf16
    rounding points, but intermediates are staged strip-by-strip through
    F-channel VMEM scratch instead of living as whole-image fp32 values.

    Four static passes over H-strips (GN needs full-image moments before
    any affine, so each GN is a stats-then-apply pair):
      1. conv1 per strip → bf16 ``y1`` scratch + GN1 partial stats;
      2. GN1-affine+relu on strip+1-row-halo reads of ``y1``, 3×3 as 9
         shifted dots → bf16 ``y2`` scratch + GN2 partial stats;
      3. GN2-affine+relu, conv3 per strip → GN3 partial stats (``y3``
         strips are DISCARDED — cheaper to recompute one full-MXU 1×1 in
         pass 4 than to hold an [H,W,C] scratch);
      4. recompute conv3, GN3 affine, +identity, relu → output strip.

    Versus the whole-image kernel this trades one extra 1×1-expand conv
    per block for peak VMEM residency ~[H,W,2F+…] instead of
    ~[H,W,(10..12)F] — the difference that made res2 (160×160×256 @640px)
    thrash.  HBM traffic is identical: 1 block-input read + 1 output
    write.  GN moments accumulate per-strip in fp32, so results match the
    whole-image kernel to fp32-summation-order (not bitwise).
    """
    _, h, w, c = x_ref.shape
    f = k1_ref.shape[-1]

    # Pass 1: 1×1 reduce, stats for GN1.
    s1a = jnp.zeros((1, f), jnp.float32)
    s2a = jnp.zeros((1, f), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        xs = x_ref[0, r0:r1].reshape(rs * w, c)
        y1 = jnp.dot(xs, k1_ref[0, 0], preferred_element_type=jnp.float32)
        yb = y1.astype(jnp.bfloat16)
        y1_scr[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1a += p1
        s2a += p2
    scale1, shift1 = _gn_scale_shift(s1a, s2a, h * w, g1_ref[:], b1_ref[:],
                                     resolve_groups(f), eps)

    # Pass 2: GN1+relu on haloed reads, 3×3 SAME as 9 shifted dots.
    s1a = jnp.zeros((1, f), jnp.float32)
    s2a = jnp.zeros((1, f), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        lo, hi = max(r0 - 1, 0), min(r1 + 1, h)
        blk = y1_scr[lo:hi].reshape((hi - lo) * w, f)
        blkn = jnp.maximum(blk * scale1 + shift1, 0).reshape(hi - lo, w, f)
        # SAME zero-padding happens in conv2's (post-GN) input domain, so
        # out-of-image halo rows are zeros — exactly jnp.pad.
        padded = jnp.pad(blkn, ((1 - (r0 - lo), 1 - (hi - r1)),
                                (1, 1), (0, 0)))
        acc = jnp.zeros((rs * w, f), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = padded[dy:dy + rs, dx:dx + w, :].reshape(rs * w, f)
                acc = acc + jnp.dot(tap, k2_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
        yb = acc.astype(jnp.bfloat16)
        y2_scr[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1a += p1
        s2a += p2
    scale2, shift2 = _gn_scale_shift(s1a, s2a, h * w, g2_ref[:], b2_ref[:],
                                     resolve_groups(f), eps)

    # Pass 3: stats for GN3 only (y3 strips discarded, see docstring).
    s1a = jnp.zeros((1, c), jnp.float32)
    s2a = jnp.zeros((1, c), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        y2n = jnp.maximum(
            y2_scr[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        y3 = jnp.dot(y2n, k3_ref[0, 0], preferred_element_type=jnp.float32)
        p1, p2 = _gn_partial_stats(y3.astype(jnp.bfloat16))
        s1a += p1
        s2a += p2
    scale3, shift3 = _gn_scale_shift(s1a, s2a, h * w, g3_ref[:], b3_ref[:],
                                     resolve_groups(c), eps)

    # Pass 4: recompute conv3, GN3 affine, +identity, relu.
    for r0, r1 in strips:
        rs = r1 - r0
        y2n = jnp.maximum(
            y2_scr[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        y3 = jnp.dot(y2n, k3_ref[0, 0], preferred_element_type=jnp.float32)
        yb = y3.astype(jnp.bfloat16) * scale3 + shift3
        xs = x_ref[0, r0:r1].reshape(rs * w, c)
        out_ref[0, r0:r1] = jnp.maximum(yb + xs, 0).reshape(rs, w, c)


def _proj_strip_kernel(x_ref, k1_ref, g1_ref, b1_ref, k2_ref, g2_ref,
                       b2_ref, k3_ref, g3_ref, b3_ref, kp_ref, gp_ref,
                       bp_ref, out_ref, y1_scr, y2_scr, yp_scr, *,
                       eps: float, strips):
    """Strip-tiled STRIDE-1 PROJECTION bottleneck (res2 block 0): the
    identity branch is ``GN(x·kp)`` instead of ``x``.  Same four passes as
    ``_strip_kernel`` plus: pass 1 also computes the projection conv into a
    bf16 scratch plane (with GNp partial stats); pass 4 applies the GNp
    affine to that plane before the residual add.  The projection plane
    costs one extra [H,W,C]-bf16 VMEM resident — affordable at res2-b0
    where the block INPUT is only 64-wide.  HBM traffic stays 1 read +
    1 write; XLA's path pays ~14 tensor passes for this block (the
    projection adds conv-write + GN stats read + affine read/write)."""
    _, h, w, cin = x_ref.shape
    f = k1_ref.shape[-1]
    c = k3_ref.shape[-1]

    # Pass 1: 1×1 reduce (GN1 stats) and 1×1 projection (GNp stats).
    s1a = jnp.zeros((1, f), jnp.float32)
    s2a = jnp.zeros((1, f), jnp.float32)
    sp1 = jnp.zeros((1, c), jnp.float32)
    sp2 = jnp.zeros((1, c), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        xs = x_ref[0, r0:r1].reshape(rs * w, cin)
        y1 = jnp.dot(xs, k1_ref[0, 0], preferred_element_type=jnp.float32)
        yb = y1.astype(jnp.bfloat16)
        y1_scr[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1a += p1
        s2a += p2
        yp = jnp.dot(xs, kp_ref[0, 0], preferred_element_type=jnp.float32)
        ypb = yp.astype(jnp.bfloat16)
        yp_scr[r0:r1] = ypb.reshape(rs, w, c)
        q1, q2 = _gn_partial_stats(ypb)
        sp1 += q1
        sp2 += q2
    scale1, shift1 = _gn_scale_shift(s1a, s2a, h * w, g1_ref[:], b1_ref[:],
                                     resolve_groups(f), eps)
    scalep, shiftp = _gn_scale_shift(sp1, sp2, h * w, gp_ref[:], bp_ref[:],
                                     resolve_groups(c), eps)

    # Pass 2: GN1+relu on haloed reads, 3×3 SAME as 9 shifted dots.
    s1a = jnp.zeros((1, f), jnp.float32)
    s2a = jnp.zeros((1, f), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        lo, hi = max(r0 - 1, 0), min(r1 + 1, h)
        blk = y1_scr[lo:hi].reshape((hi - lo) * w, f)
        blkn = jnp.maximum(blk * scale1 + shift1, 0).reshape(hi - lo, w, f)
        padded = jnp.pad(blkn, ((1 - (r0 - lo), 1 - (hi - r1)),
                                (1, 1), (0, 0)))
        acc = jnp.zeros((rs * w, f), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = padded[dy:dy + rs, dx:dx + w, :].reshape(rs * w, f)
                acc = acc + jnp.dot(tap, k2_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
        yb = acc.astype(jnp.bfloat16)
        y2_scr[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1a += p1
        s2a += p2
    scale2, shift2 = _gn_scale_shift(s1a, s2a, h * w, g2_ref[:], b2_ref[:],
                                     resolve_groups(f), eps)

    # Pass 3: stats for GN3 (y3 strips discarded, recomputed in pass 4).
    s1a = jnp.zeros((1, c), jnp.float32)
    s2a = jnp.zeros((1, c), jnp.float32)
    for r0, r1 in strips:
        rs = r1 - r0
        y2n = jnp.maximum(
            y2_scr[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        y3 = jnp.dot(y2n, k3_ref[0, 0], preferred_element_type=jnp.float32)
        p1, p2 = _gn_partial_stats(y3.astype(jnp.bfloat16))
        s1a += p1
        s2a += p2
    scale3, shift3 = _gn_scale_shift(s1a, s2a, h * w, g3_ref[:], b3_ref[:],
                                     resolve_groups(c), eps)

    # Pass 4: recompute conv3, GN3 affine, + GNp-affine(projection), relu.
    for r0, r1 in strips:
        rs = r1 - r0
        y2n = jnp.maximum(
            y2_scr[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        y3 = jnp.dot(y2n, k3_ref[0, 0], preferred_element_type=jnp.float32)
        yb = y3.astype(jnp.bfloat16) * scale3 + shift3
        idn = yp_scr[r0:r1].reshape(rs * w, c) * scalep + shiftp
        out_ref[0, r0:r1] = jnp.maximum(yb + idn, 0).reshape(rs, w, c)


def fused_bottleneck_proj(x: Array, k1: Array, g1: Array, b1: Array,
                          k2: Array, g2: Array, b2: Array,
                          k3: Array, g3: Array, b3: Array,
                          kp: Array, gp: Array, bp: Array,
                          eps: float = 1e-5, interpret: bool = False,
                          strip_rows: int = 20) -> Array:
    """Stride-1 projection bottleneck (res2 block 0), one image per grid
    step: ``relu(GN3(conv3(a2)) + GNp(x·kp))``.

    x [B,H,W,Cin]; k1 [1,1,Cin,F]; k2 [3,3,F,F]; k3 [1,1,F,C];
    kp [1,1,Cin,C]; g*/b* the GN affines.  Returns bf16 [B,H,W,C].
    Only the strip-tiled variant exists (``strip_rows=0`` falls back to a
    single whole-image strip).
    """
    b, h, w, cin = x.shape
    f = k1.shape[-1]
    c = k3.shape[-1]
    assert kp.shape[-2:] == (cin, c) and k2.shape == (3, 3, f, f)
    rows = min(strip_rows or h, h)
    strips = tuple((r0, min(r0 + rows, h)) for r0 in range(0, h, rows))
    kernel = functools.partial(_proj_strip_kernel, eps=eps, strips=strips)
    to_bf16 = lambda a: a.astype(jnp.bfloat16)
    row2d = lambda a: a.reshape(1, -1).astype(jnp.float32)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    operands = (x.astype(jnp.bfloat16),
                to_bf16(k1), row2d(g1), row2d(b1),
                to_bf16(k2), row2d(g2), row2d(b2),
                to_bf16(k3), row2d(g3), row2d(b3),
                to_bf16(kp), row2d(gp), row2d(bp))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0))]
                 + [full(a) for a in operands[1:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        scratch_shapes=(pltpu.VMEM((h, w, f), jnp.bfloat16),
                        pltpu.VMEM((h, w, f), jnp.bfloat16),
                        pltpu.VMEM((h, w, c), jnp.bfloat16)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)


def fused_bottleneck(x: Array, k1: Array, g1: Array, b1: Array,
                     k2: Array, g2: Array, b2: Array,
                     k3: Array, g3: Array, b3: Array,
                     eps: float = 1e-5, interpret: bool = False,
                     strip_rows: int = 0) -> Array:
    """One identity bottleneck block, one image per grid step.

    x [B,H,W,C] bf16; k1 [1,1,C,F]; k2 [3,3,F,F]; k3 [1,1,F,C];
    g*/b* the GN affines.  Returns bf16 [B,H,W,C].

    ``strip_rows=0`` runs the whole-image-in-VMEM kernel (fp32
    intermediates live as full-image values — fine up to res3 scale).
    ``strip_rows>0`` runs the strip-tiled kernel (``_strip_kernel``) whose
    peak residency is bounded by the two F-channel scratch planes — the
    variant that makes res2 canvases viable.
    """
    b, h, w, c = x.shape
    f = k1.shape[-1]
    assert k3.shape[-1] == c and k2.shape == (3, 3, f, f)

    scratch_shapes = ()
    if strip_rows and strip_rows < h:
        strips = tuple((r0, min(r0 + strip_rows, h))
                       for r0 in range(0, h, strip_rows))
        kernel = functools.partial(_strip_kernel, eps=eps, strips=strips)
        scratch_shapes = (pltpu.VMEM((h, w, f), jnp.bfloat16),
                          pltpu.VMEM((h, w, f), jnp.bfloat16))
    else:
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
        scratch_shapes=scratch_shapes,
        # Whole-image residency + fp32 stats temporaries exceed the 16 MB
        # default scoped-VMEM budget at res3 scale (measured: 25 MB needed
        # for [80,80,512]/f=128 at 640px).  v5e has 128 MB VMEM; raise the
        # kernel budget and let the in-model A/B decide adoption.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
