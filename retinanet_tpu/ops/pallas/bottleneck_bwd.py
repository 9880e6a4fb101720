"""Fused backward pass for the identity ResNet bottleneck (Pallas, TPU).

Why this exists (NOTES round-4 ``bwdprof``/``rematsweep``): the flagship
backbone BACKWARD is HBM-saturated under XLA autodiff — 81.8% of the HBM
roofline through C2 rising to 102.8% through C5 at 9-27% MFU — and XLA
remat makes it *worse* (-8%: recomputing the forward inside the backward
re-reads every block input from HBM).  The only traffic reduction left is
recomputing the forward *inside VMEM*, which autodiff cannot express.

This kernel computes the whole identity-bottleneck backward
(``models/resnet.py:ResNetBottleneck``: 1×1 → GN+relu → 3×3 → GN+relu →
1×1 → GN → +identity → relu) in ONE ``pallas_call`` per block with HBM
traffic of exactly: 1 read of the block input ``x``, 1 read of the output
cotangent ``dout``, 1 write of the input cotangent ``dx`` (weight grads
are KB-sized).  XLA autodiff on the same block reads ~6 saved activation
planes and writes intermediate cotangents between fusion groups — about
4× the bytes.  The extra in-VMEM recompute FLOPs (+~25% MACs per block)
are free at 9-27% backward MFU.

Structure: seven strip-tiled passes per image (grid over the batch;
H-strips bound fp32 residency exactly like the forward
``bottleneck.py:_strip_kernel``).  ``x``/``dout``/``dx`` live in HBM
(``memory_space=ANY``) and are staged by explicit DMA — ``x`` once into a
whole-image VMEM plane, ``dout``/``dx`` strip-by-strip.  The grid over
the batch is sequential on a TPU core, which serialized every DMA wait
against compute in the first version; now the HBM reads are overlapped
(VERDICT r4 #6): image ``i+1``'s ``x`` plane prefetches into the
alternate slot of a double buffer while image ``i``'s seven passes run,
and P4's ``dout`` strips double-buffer so strip ``s+1`` lands during
strip ``s``'s compute.  The ``dx`` write-back already overlapped with
the conv1 wgrad.  Passes:

  P1  x@k1 per strip → yb1 plane, GN1 moment sums
  P2  GN1-affine+relu on 1-row-halo reads of yb1, 3×3 as 9 shifted dots
      → yb2 plane, GN2 sums
  P3  GN2-affine+relu, @k3 → yb3 plane, GN3 sums
  P4  DMA dout strips; dn3 = dout·[relu'(GN3(yb3)+x)] → dn3 plane,
      GN3 cotangent sums (dγ3, dβ3 and the group-mean terms)
  P5  dy3 (GN3 backward) → da2 = dy3·k3ᵀ, dk3 += a2ᵀ·dy3,
      dn2 = da2·relu'(n2) → dn2 plane, GN2 cotangent sums
  P6  dy2 on halo rows (GN2 backward), conv2 dgrad as 9 reverse-shifted
      dots, dk2 wgrad from recomputed a1 taps, dn1 → dn1 plane, GN1 sums
  P7  dy1 (GN1 backward) → dx = dy1·k1ᵀ + dn3 (identity branch), DMA out;
      dk1 += xᵀ·dy1

GroupNorm backward needs only per-channel sums: with ŷ=(y−μ)/σ and
per-channel γ, dy = (1/σ)(γ·do − mean_g(γ·do) − ŷ·mean_g(γ·do·ŷ)), and
both group means reduce from the per-channel sums Σdo and Σdo·ŷ via the
same membership matmuls the forward uses (``bottleneck._group_sum``) —
no extra elementwise passes.  dγ = Σdo·ŷ, dβ = Σdo.

Numerics match XLA autodiff's bit-placement choices: inter-op cotangents
are bf16 (JAX cotangents carry the primal dtype), matmuls run
bf16×bf16→fp32, GN statistics and weight-gradient accumulation are fp32.
Strip/grid accumulation order differs from XLA's tree reductions, so
agreement is to fp32-summation-order, not bitwise (tested).

Weight gradients accumulate across the batch grid dimension in VMEM
(constant-index output blocks, zero-initialised at image 0) — TPU grids
are sequential, so the accumulation is race-free.

Reference parity: gradient of ``/root/reference/resnet.py:84-101`` block
structure with ``normalization.py:4-35`` GN, as produced by TF autodiff;
here hand-derived for the VMEM-resident formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinanet_tpu.models.layers import resolve_groups
from retinanet_tpu.ops.pallas.bottleneck import (_gn_moments,
                                                 _gn_partial_stats,
                                                 _group_sum,
                                                 fused_bottleneck)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _dot(a: Array, b: Array, contract_a: int, contract_b: int) -> Array:
    """bf16×bf16→fp32 dot_general contracting one dim of each operand —
    avoids explicit ``.T`` transposes (a Mosaic relayout)."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=_F32)


def _gn_bwd_terms(sb: Array, sg: Array, gamma32: Array, m: int, groups: int):
    """Group-mean terms of the GN backward from the per-channel cotangent
    sums sβ=Σdo, sγ=Σdo·ŷ: t1 = mean_g(γ·do), t2 = mean_g(γ·do·ŷ),
    both broadcast back per channel [1, C]."""
    c = sb.shape[-1]
    n = m * (c // groups)
    t1 = _group_sum(gamma32 * sb, groups) / n
    t2 = _group_sum(gamma32 * sg, groups) / n
    return t1, t2


def _bwd_kernel(x_hbm, dout_hbm, k1_ref, g1_ref, b1_ref, k2_ref, g2_ref,
                b2_ref, k3_ref, g3_ref, b3_ref,
                dx_hbm, dk1_ref, dg1_ref, db1_ref, dk2_ref, dg2_ref, db2_ref,
                dk3_ref, dg3_ref, db3_ref,
                x_db, yb1, yb2, yb3, dn3, dn2, dn1, ds_db, dx_buf,
                sem_x, sem_do, sem, *,
                eps: float, strips, nb: int, h: int, w: int, c: int, f: int):
    i = pl.program_id(0)
    m = h * w
    gf = resolve_groups(f)
    gc = resolve_groups(c)
    g1 = g1_ref[:]                                   # [1, F] f32
    g2 = g2_ref[:]
    g3 = g3_ref[:]                                   # [1, C] f32

    @pl.when(i == 0)
    def _init():
        for ref in (dk1_ref, dg1_ref, db1_ref, dk2_ref, dg2_ref, db2_ref,
                    dk3_ref, dg3_ref, db3_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # Whole image in one DMA: x is read by P1 (conv1), P4 (relu mask) and
    # P7 (conv1 wgrad) — staging it once beats three HBM reads.  The plane
    # is DOUBLE-buffered across the (sequential) batch grid: image i+1's
    # DMA is issued here and lands while i's seven passes compute, so the
    # per-image x read is off the critical path for every image but the
    # first (VERDICT r4 #6: the serialized per-image grid).
    slot = i % 2
    x_pl = x_db.at[slot]

    @pl.when(i == 0)
    def _first_x():
        pltpu.make_async_copy(x_hbm.at[0], x_db.at[0], sem_x.at[0]).start()

    pltpu.make_async_copy(x_hbm.at[i], x_pl, sem_x.at[slot]).wait()

    @pl.when(i + 1 < nb)
    def _prefetch_x():
        nxt = (i + 1) % 2
        pltpu.make_async_copy(x_hbm.at[i + 1], x_db.at[nxt],
                              sem_x.at[nxt]).start()

    # ---- P1: conv1 forward per strip, GN1 moment sums -----------------
    s1 = jnp.zeros((1, f), _F32)
    s2 = jnp.zeros((1, f), _F32)
    for r0, r1 in strips:
        rs = r1 - r0
        xs = x_pl[r0:r1].reshape(rs * w, c)
        y1 = _dot(xs, k1_ref[:], 1, 0)               # [M_s, F]
        yb = y1.astype(_BF16)
        yb1[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1 += p1
        s2 += p2
    mean1, inv1 = _gn_moments(s1, s2, m, gf, eps)
    scale1 = (inv1 * g1).astype(_BF16)
    shift1 = (b1_ref[:] - mean1 * inv1 * g1).astype(_BF16)

    # ---- P2: GN1+relu on haloed reads, 3×3 as 9 shifted dots ----------
    s1 = jnp.zeros((1, f), _F32)
    s2 = jnp.zeros((1, f), _F32)
    for r0, r1 in strips:
        rs = r1 - r0
        lo, hi = max(r0 - 1, 0), min(r1 + 1, h)
        blk = yb1[lo:hi].reshape((hi - lo) * w, f)
        a1 = jnp.maximum(blk * scale1 + shift1, 0).reshape(hi - lo, w, f)
        padded = jnp.pad(a1, ((1 - (r0 - lo), 1 - (hi - r1)), (1, 1),
                              (0, 0)))
        acc = jnp.zeros((rs * w, f), _F32)
        for dy in range(3):
            for dx in range(3):
                tap = padded[dy:dy + rs, dx:dx + w, :].reshape(rs * w, f)
                acc = acc + _dot(tap, k2_ref[dy, dx], 1, 0)
        yb = acc.astype(_BF16)
        yb2[r0:r1] = yb.reshape(rs, w, f)
        p1, p2 = _gn_partial_stats(yb)
        s1 += p1
        s2 += p2
    mean2, inv2 = _gn_moments(s1, s2, m, gf, eps)
    scale2 = (inv2 * g2).astype(_BF16)
    shift2 = (b2_ref[:] - mean2 * inv2 * g2).astype(_BF16)

    # ---- P3: GN2+relu, conv3 forward, GN3 moment sums -----------------
    s1 = jnp.zeros((1, c), _F32)
    s2 = jnp.zeros((1, c), _F32)
    for r0, r1 in strips:
        rs = r1 - r0
        a2 = jnp.maximum(yb2[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        y3 = _dot(a2, k3_ref[:], 1, 0)               # [M_s, C]
        yb = y3.astype(_BF16)
        yb3[r0:r1] = yb.reshape(rs, w, c)
        p1, p2 = _gn_partial_stats(yb)
        s1 += p1
        s2 += p2
    mean3, inv3 = _gn_moments(s1, s2, m, gc, eps)
    scale3 = (inv3 * g3).astype(_BF16)
    shift3 = (b3_ref[:] - mean3 * inv3 * g3).astype(_BF16)

    # ---- P4: output-relu mask, dn3 plane, GN3 cotangent sums ----------
    # dout strips are double-buffered: strip s+1's DMA lands while strip s
    # computes (the loop is static, so the slot index is static too).
    def _do_copy(idx: int):
        r0s, r1s = strips[idx]
        return pltpu.make_async_copy(
            dout_hbm.at[i, pl.ds(r0s, r1s - r0s)],
            ds_db.at[idx % 2, pl.ds(0, r1s - r0s)], sem_do.at[idx % 2])

    sb3 = jnp.zeros((1, c), _F32)
    sg3 = jnp.zeros((1, c), _F32)
    _do_copy(0).start()
    for idx, (r0, r1) in enumerate(strips):
        rs = r1 - r0
        _do_copy(idx).wait()
        if idx + 1 < len(strips):
            _do_copy(idx + 1).start()
        ybs = yb3[r0:r1].reshape(rs * w, c)
        n3 = ybs * scale3 + shift3                   # bf16, as the forward
        pre = n3 + x_pl[r0:r1].reshape(rs * w, c)    # bf16 add, as forward
        do = ds_db[idx % 2, pl.ds(0, rs)].reshape(rs * w, c)
        # v5e Mosaic: no bf16 vector compare ("Target does not support this
        # comparison") — compare in f32 (exact: bf16 ⊂ f32).
        d3 = jnp.where(pre.astype(_F32) > 0, do, jnp.zeros_like(do))
        dn3[r0:r1] = d3.reshape(rs, w, c)
        d32 = d3.astype(_F32)
        yhat = (ybs.astype(_F32) - mean3) * inv3
        sb3 += jnp.sum(d32, axis=0, keepdims=True)
        sg3 += jnp.sum(d32 * yhat, axis=0, keepdims=True)
    dg3_ref[...] += sg3
    db3_ref[...] += sb3
    t13, t23 = _gn_bwd_terms(sb3, sg3, g3, m, gc)

    # ---- P5: GN3 backward → conv3 dgrad/wgrad, dn2 plane, GN2 sums ----
    sb2 = jnp.zeros((1, f), _F32)
    sg2 = jnp.zeros((1, f), _F32)
    for r0, r1 in strips:
        rs = r1 - r0
        ybs = yb3[r0:r1].reshape(rs * w, c).astype(_F32)
        yhat = (ybs - mean3) * inv3
        d32 = dn3[r0:r1].reshape(rs * w, c).astype(_F32)
        dy3 = (inv3 * (g3 * d32 - t13 - yhat * t23)).astype(_BF16)
        a2 = jnp.maximum(yb2[r0:r1].reshape(rs * w, f) * scale2 + shift2, 0)
        da2 = _dot(dy3, k3_ref[:], 1, 1)             # [M_s, F] = dy3·k3ᵀ
        dk3_ref[...] += _dot(a2, dy3, 0, 0)          # [F, C]
        n2 = yb2[r0:r1].reshape(rs * w, f) * scale2 + shift2
        d2 = jnp.where(n2.astype(_F32) > 0, da2.astype(_BF16),
                       jnp.zeros((), _BF16))
        dn2[r0:r1] = d2.reshape(rs, w, f)
        d22 = d2.astype(_F32)
        yhat2 = (yb2[r0:r1].reshape(rs * w, f).astype(_F32) - mean2) * inv2
        sb2 += jnp.sum(d22, axis=0, keepdims=True)
        sg2 += jnp.sum(d22 * yhat2, axis=0, keepdims=True)
    dg2_ref[...] += sg2
    db2_ref[...] += sb2
    t12, t22 = _gn_bwd_terms(sb2, sg2, g2, m, gf)

    # ---- P6: GN2 backward on halo rows, conv2 dgrad + wgrad, dn1 ------
    sb1 = jnp.zeros((1, f), _F32)
    sg1 = jnp.zeros((1, f), _F32)
    for r0, r1 in strips:
        rs = r1 - r0
        lo, hi = max(r0 - 1, 0), min(r1 + 1, h)
        hw = (hi - lo) * w
        ybh = yb2[lo:hi].reshape(hw, f)
        d2h = dn2[lo:hi].reshape(hw, f).astype(_F32)
        yhat2 = (ybh.astype(_F32) - mean2) * inv2
        dy2h = (inv2 * (g2 * d2h - t12 - yhat2 * t22)).astype(_BF16)
        dy2h = dy2h.reshape(hi - lo, w, f)
        # dgrad: da1[q] = Σ_o dy2[q−o]·k2[o]ᵀ.  Cotangent rows outside the
        # image are ZERO (unlike the forward's SAME padding, which pads the
        # *input* domain) — zero-pad dy2 to rs+2 rows / w+2 cols and take
        # reverse taps.
        pdy = jnp.pad(dy2h, ((1 - (r0 - lo), 1 - (hi - r1)), (1, 1),
                             (0, 0)))
        acc = jnp.zeros((rs * w, f), _F32)
        for dy in range(3):
            for dx in range(3):
                tap = pdy[2 - dy:2 - dy + rs, 2 - dx:2 - dx + w, :]
                acc = acc + _dot(tap.reshape(rs * w, f), k2_ref[dy, dx],
                                 1, 1)
        # wgrad: dk2[o] = Σ_q a1[q+o]ᵀ·dy2[q] — a1 taps use the SAME
        # forward padding (zeros in conv2's input domain).
        blk = yb1[lo:hi].reshape(hw, f)
        a1h = jnp.maximum(blk * scale1 + shift1, 0).reshape(hi - lo, w, f)
        pa1 = jnp.pad(a1h, ((1 - (r0 - lo), 1 - (hi - r1)), (1, 1), (0, 0)))
        dy2c = dy2h[r0 - lo:r0 - lo + rs].reshape(rs * w, f)
        for dy in range(3):
            for dx in range(3):
                tap = pa1[dy:dy + rs, dx:dx + w, :].reshape(rs * w, f)
                dk2_ref[dy, dx] += _dot(tap, dy2c, 0, 0)
        n1 = yb1[r0:r1].reshape(rs * w, f) * scale1 + shift1
        d1 = jnp.where(n1.astype(_F32) > 0, acc.astype(_BF16),
                       jnp.zeros((), _BF16))
        dn1[r0:r1] = d1.reshape(rs, w, f)
        d12 = d1.astype(_F32)
        yhat1 = (yb1[r0:r1].reshape(rs * w, f).astype(_F32) - mean1) * inv1
        sb1 += jnp.sum(d12, axis=0, keepdims=True)
        sg1 += jnp.sum(d12 * yhat1, axis=0, keepdims=True)
    dg1_ref[...] += sg1
    db1_ref[...] += sb1
    t11, t21 = _gn_bwd_terms(sb1, sg1, g1, m, gf)

    # ---- P7: GN1 backward → conv1 dgrad (+identity) and wgrad ---------
    for r0, r1 in strips:
        rs = r1 - r0
        ybs = yb1[r0:r1].reshape(rs * w, f)
        yhat1 = (ybs.astype(_F32) - mean1) * inv1
        d12 = dn1[r0:r1].reshape(rs * w, f).astype(_F32)
        dy1 = (inv1 * (g1 * d12 - t11 - yhat1 * t21)).astype(_BF16)
        dxs = _dot(dy1, k1_ref[:], 1, 1).astype(_BF16)   # [M_s, C] = dy1·k1ᵀ
        dxs = dxs + dn3[r0:r1].reshape(rs * w, c)        # identity branch
        dx_buf[pl.ds(0, rs)] = dxs.reshape(rs, w, c)
        dma_dx = pltpu.make_async_copy(dx_buf.at[pl.ds(0, rs)],
                                       dx_hbm.at[i, pl.ds(r0, rs)], sem)
        dma_dx.start()
        xs = x_pl[r0:r1].reshape(rs * w, c)
        dk1_ref[...] += _dot(xs, dy1, 0, 0)              # [C, F]
        # Wait before dx_buf is overwritten by the next strip.
        dma_dx.wait()


def fused_bottleneck_bwd(x: Array, dout: Array, k1: Array, g1: Array,
                         b1: Array, k2: Array, g2: Array, b2: Array,
                         k3: Array, g3: Array, b3: Array,
                         eps: float = 1e-5, interpret: bool = False,
                         strip_rows: int = 20):
    """Gradients of :func:`bottleneck.fused_bottleneck` wrt every input.

    Returns ``(dx, dk1, dg1, db1, dk2, dg2, db2, dk3, dg3, db3)`` with
    ``dx`` bf16 and fp32 weight grads in the primal parameter shapes.
    """
    b, h, w, c = x.shape
    f = k1.shape[-1]
    rows = min(strip_rows or h, h)
    strips = tuple((r0, min(r0 + rows, h)) for r0 in range(0, h, rows))
    rmax = max(r1 - r0 for r0, r1 in strips)
    kernel = functools.partial(_bwd_kernel, eps=eps, strips=strips,
                               nb=b, h=h, w=w, c=c, f=f)
    row2d = lambda a: a.reshape(1, -1).astype(_F32)
    operands = (x.astype(_BF16), dout.astype(_BF16),
                k1.reshape(c, f).astype(_BF16), row2d(g1), row2d(b1),
                k2.astype(_BF16), row2d(g2), row2d(b2),
                k3.reshape(f, c).astype(_BF16), row2d(g3), row2d(b3))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out_shapes = [
        jax.ShapeDtypeStruct((b, h, w, c), _BF16),       # dx
        jax.ShapeDtypeStruct((c, f), _F32),              # dk1
        jax.ShapeDtypeStruct((1, f), _F32),              # dg1
        jax.ShapeDtypeStruct((1, f), _F32),              # db1
        jax.ShapeDtypeStruct((3, 3, f, f), _F32),        # dk2
        jax.ShapeDtypeStruct((1, f), _F32),              # dg2
        jax.ShapeDtypeStruct((1, f), _F32),              # db2
        jax.ShapeDtypeStruct((f, c), _F32),              # dk3
        jax.ShapeDtypeStruct((1, c), _F32),              # dg3
        jax.ShapeDtypeStruct((1, c), _F32),              # db3
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),     # x (DMA'd)
                  pl.BlockSpec(memory_space=pl.ANY)]     # dout (DMA'd)
                 + [full(a) for a in operands[2:]],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)]    # dx (DMA'd)
                  + [const(s.shape) for s in out_shapes[1:]],
        out_shape=out_shapes,
        scratch_shapes=(
            pltpu.VMEM((2, h, w, c), _BF16),             # x planes (db)
            pltpu.VMEM((h, w, f), _BF16),                # yb1
            pltpu.VMEM((h, w, f), _BF16),                # yb2
            pltpu.VMEM((h, w, c), _BF16),                # yb3
            pltpu.VMEM((h, w, c), _BF16),                # dn3
            pltpu.VMEM((h, w, f), _BF16),                # dn2
            pltpu.VMEM((h, w, f), _BF16),                # dn1
            pltpu.VMEM((2, rmax, w, c), _BF16),          # dout strips (db)
            pltpu.VMEM((rmax, w, c), _BF16),             # dx strip
            pltpu.SemaphoreType.DMA((2,)),               # x prefetch sems
            pltpu.SemaphoreType.DMA((2,)),               # dout strip sems
            pltpu.SemaphoreType.DMA(()),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(*operands)
    dx, dk1, dg1, db1, dk2, dg2, db2, dk3, dg3, db3 = outs
    return (dx.astype(x.dtype),
            dk1.reshape(k1.shape), dg1.reshape(g1.shape),
            db1.reshape(b1.shape), dk2, dg2.reshape(g2.shape),
            db2.reshape(b2.shape), dk3.reshape(k3.shape),
            dg3.reshape(g3.shape), db3.reshape(b3.shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_bottleneck_train(x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
                           eps, interpret, strip_rows, bwd_strip_rows):
    """Identity bottleneck with the fused Pallas forward AND a hand-fused
    Pallas backward (``_bwd_kernel``) as its custom VJP.

    ``strip_rows`` tiles the forward (0 = whole-image kernel, as serving);
    ``bwd_strip_rows`` tiles the backward (always strip-tiled).  Residuals
    are just the primals — the backward recomputes every intermediate in
    VMEM, so training stores NO per-block activations beyond the block
    inputs the residual chain keeps alive anyway.
    """
    return fused_bottleneck(x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
                            eps=eps, interpret=interpret,
                            strip_rows=strip_rows)


def _train_fwd(x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
               eps, interpret, strip_rows, bwd_strip_rows):
    out = fused_bottleneck(x, k1, g1, b1, k2, g2, b2, k3, g3, b3,
                           eps=eps, interpret=interpret,
                           strip_rows=strip_rows)
    return out, (x, k1, g1, b1, k2, g2, b2, k3, g3, b3)


def _train_bwd(eps, interpret, strip_rows, bwd_strip_rows, res, dout):
    x, k1, g1, b1, k2, g2, b2, k3, g3, b3 = res
    return fused_bottleneck_bwd(x, dout, k1, g1, b1, k2, g2, b2, k3, g3,
                                b3, eps=eps, interpret=interpret,
                                strip_rows=bwd_strip_rows)


fused_bottleneck_train.defvjp(_train_fwd, _train_bwd)
