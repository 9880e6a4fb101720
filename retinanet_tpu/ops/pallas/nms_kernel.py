"""Fused greedy-NMS suppression kernel for TPU (Pallas).

The pure-JAX fallback (``ops/nms.py:_greedy_keep_mask``) materializes the
full [N, N] IoU matrix in HBM (100 MB at N=5000) and runs N fori_loop steps
against it.  This kernel tiles the computation instead: boxes live in VMEM as
four coordinate planes of shape [num_tiles, 128]; for each 128-box tile the
kernel (a) suppresses against every *earlier* tile's kept boxes via an
on-the-fly 128×128 IoU block (VPU), then (b) resolves the sequential
dependence *within* the tile with a 128-step lane-masked loop.  No IoU matrix
ever touches HBM and the sequential chain is only N/128 × 128 short steps.

Greedy semantics are bit-identical to the fallback: a box is kept iff no
higher-scoring kept box overlaps it above the threshold (inputs must be
sorted by descending score, as in ``nms_padded``).

Capability note: this Pallas program relies only on VMEM block specs, 2-D
iota, fori_loop and elementwise VPU ops — no DMA or semaphores needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_block(ay1, ax1, ay2, ax2, by1, bx1, by2, bx2):
    """[T] coords × [T] coords → [T, T] IoU (rows = a, cols = b)."""
    y_top = jnp.maximum(ay1[:, None], by1[None, :])
    x_left = jnp.maximum(ax1[:, None], bx1[None, :])
    y_bot = jnp.minimum(ay2[:, None], by2[None, :])
    x_right = jnp.minimum(ax2[:, None], bx2[None, :])
    ih = y_bot - y_top
    iw = x_right - x_left
    inter = jnp.where((ih > 0) & (iw > 0), ih * iw, 0.0)
    area_a = ((ay2 - ay1) * (ax2 - ax1))[:, None]
    area_b = ((by2 - by1) * (bx2 - bx1))[None, :]
    union = area_a + area_b - inter
    return inter / jnp.where(union > 0, union, 1.0)


def _nms_kernel(y1_ref, x1_ref, y2_ref, x2_ref, keep_ref, iou_scratch, *,
                iou_threshold: float, num_tiles: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

    def tile_body(ti, _):
        ty1, tx1 = y1_ref[ti, :], x1_ref[ti, :]
        ty2, tx2 = y2_ref[ti, :], x2_ref[ti, :]
        active = jnp.ones((1, TILE), jnp.float32)

        # (a) suppress by kept boxes of all earlier tiles.  Static trip
        # count (dynamic-bound loops nested in loops stall the Mosaic
        # pipeline); tiles at or after ti are masked out.
        def prev_body(tj, active):
            iou = _iou_block(ty1, tx1, ty2, tx2,
                             y1_ref[tj, :], x1_ref[tj, :],
                             y2_ref[tj, :], x2_ref[tj, :])  # [T, T]
            prev_keep = keep_ref[tj, :][None, :]            # [1, T]
            # hit[i] = any kept j in tile tj with IoU(i, j) > threshold.
            hit = jnp.max(jnp.where(
                (iou > iou_threshold) & (prev_keep > 0), 1.0, 0.0),
                axis=1)[None, :]
            hit = jnp.where(tj < ti, hit, 0.0)
            return active * (1.0 - hit)

        active = jax.lax.fori_loop(0, num_tiles, prev_body, active)

        # (b) sequential resolve within the tile.  Pallas TPU can't
        # dynamic_slice a *value*, so stage the IoU block through VMEM
        # scratch and slice the ref; the loop-carried active[k] scalar is
        # read with a lane-masked reduce.
        iou_scratch[:, :] = _iou_block(ty1, tx1, ty2, tx2,
                                       ty1, tx1, ty2, tx2)

        def inner_body(k, active):
            row = iou_scratch[pl.ds(k, 1), :]               # [1, T]
            k_active = jnp.sum(
                jnp.where(lane == k, active, 0.0), axis=1, keepdims=True)
            suppress = (row > iou_threshold) & (lane > k) & (k_active > 0)
            return active * (1.0 - suppress.astype(jnp.float32))

        active = jax.lax.fori_loop(0, TILE, inner_body, active)
        keep_ref[ti, :] = active[0, :]
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


def _nms_kernel_batch(y1_ref, x1_ref, y2_ref, x2_ref, keep_ref, iou_scratch,
                      *, iou_threshold: float, num_tiles: int):
    """Batched variant: refs are [num_tiles, B, TILE]; every sequential
    suppression step processes all B images at once (the per-image decisions
    are independent), so the sequential chain length is batch-size-free."""
    b = y1_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, TILE), 1)

    def iou3(ay1, ax1, ay2, ax2, by1, bx1, by2, bx2):
        # [B, T] × [B, T] → [B, T, T]
        y_top = jnp.maximum(ay1[:, :, None], by1[:, None, :])
        x_left = jnp.maximum(ax1[:, :, None], bx1[:, None, :])
        y_bot = jnp.minimum(ay2[:, :, None], by2[:, None, :])
        x_right = jnp.minimum(ax2[:, :, None], bx2[:, None, :])
        ih = y_bot - y_top
        iw = x_right - x_left
        inter = jnp.where((ih > 0) & (iw > 0), ih * iw, 0.0)
        area_a = ((ay2 - ay1) * (ax2 - ax1))[:, :, None]
        area_b = ((by2 - by1) * (bx2 - bx1))[:, None, :]
        union = area_a + area_b - inter
        return inter / jnp.where(union > 0, union, 1.0)

    def tile_body(ti, _):
        ty1, tx1 = y1_ref[ti], x1_ref[ti]
        ty2, tx2 = y2_ref[ti], x2_ref[ti]
        active = jnp.ones((b, TILE), jnp.float32)

        def prev_body(tj, active):
            iou = iou3(ty1, tx1, ty2, tx2,
                       y1_ref[tj], x1_ref[tj], y2_ref[tj], x2_ref[tj])
            prev_keep = keep_ref[tj][:, None, :]  # [B, 1, T]
            hit = jnp.max(jnp.where(
                (iou > iou_threshold) & (prev_keep > 0), 1.0, 0.0), axis=2)
            hit = jnp.where(tj < ti, hit, 0.0)
            return active * (1.0 - hit)

        active = jax.lax.fori_loop(0, num_tiles, prev_body, active)

        iou_scratch[:, :, :] = iou3(ty1, tx1, ty2, tx2, ty1, tx1, ty2, tx2)

        def inner_body(k, active):
            row = iou_scratch[:, pl.ds(k, 1), :][:, 0, :]       # [B, T]
            k_active = jnp.sum(jnp.where(lane == k, active, 0.0),
                               axis=1, keepdims=True)           # [B, 1]
            suppress = (row > iou_threshold) & (lane > k) & (k_active > 0)
            return active * (1.0 - suppress.astype(jnp.float32))

        active = jax.lax.fori_loop(0, TILE, inner_body, active)
        keep_ref[ti] = active
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


def _batch_chunk_size(bsz: int, num_tiles: int) -> int:
    """Largest per-call batch chunk that keeps the kernel inside VMEM.

    Per image the kernel holds 5 coordinate/output planes of
    [num_tiles, TILE] f32 plus ~10 live [TILE, TILE] f32 temporaries
    (scratch + the IoU block's intermediates — Mosaic materializes each
    elementwise step in VMEM; measured 19.76 MB at B=32, nt=8).  Budget
    ~9 MB of the 16 MB of scoped VMEM."""
    per_image = num_tiles * TILE * 4 * 5 + 10 * TILE * TILE * 4
    return max(1, min(bsz, int(9e6 // per_image)))


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_keep_mask_batch(boxes: Array, iou_threshold: float = 0.5) -> Array:
    """Batched keep mask: score-sorted corner boxes [B, N, 4] → [B, N] bool.

    One kernel invocation per VMEM-sized batch chunk; sequential suppression
    steps are shared across the images of a chunk (lanes = box slots,
    sublanes = images)."""
    bsz, n, _ = boxes.shape
    num_tiles = -(-n // TILE)
    padded = num_tiles * TILE
    if padded != n:
        pad = jnp.full((bsz, padded - n, 4), -1e6, boxes.dtype)
        pad = pad + jnp.arange(padded - n,
                               dtype=boxes.dtype)[None, :, None] * 8.0
        boxes = jnp.concatenate([boxes, pad], axis=1)

    chunk = _batch_chunk_size(bsz, num_tiles)
    outs = []
    for b0 in range(0, bsz, chunk):
        b1 = min(bsz, b0 + chunk)
        sub = boxes[b0:b1]
        # [Bc, nt*T, 4] → 4 planes of [nt, Bc, T].
        coords = [sub[:, :, i].reshape(b1 - b0, num_tiles, TILE)
                  .transpose(1, 0, 2).astype(jnp.float32) for i in range(4)]
        keep = pl.pallas_call(
            functools.partial(_nms_kernel_batch,
                              iou_threshold=float(iou_threshold),
                              num_tiles=num_tiles),
            out_shape=jax.ShapeDtypeStruct((num_tiles, b1 - b0, TILE),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((b1 - b0, TILE, TILE), jnp.float32)],
        )(*coords)
        outs.append(keep.transpose(1, 0, 2).reshape(b1 - b0, padded))
    return jnp.concatenate(outs, axis=0)[:, :n] > 0


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_keep_mask(boxes: Array, iou_threshold: float = 0.5) -> Array:
    """keep mask [N] for score-sorted corner boxes [N, 4] (N padded to 128).

    Drop-in replacement for ``ops.nms._greedy_keep_mask`` (verified
    equivalent in tests).
    """
    n = boxes.shape[0]
    num_tiles = -(-n // TILE)
    padded = num_tiles * TILE
    # Pad with far-away boxes that overlap nothing.
    if padded != n:
        pad = jnp.full((padded - n, 4), -1e6, boxes.dtype)
        pad = pad + jnp.arange(padded - n, dtype=boxes.dtype)[:, None] * 8.0
        boxes = jnp.concatenate([boxes, pad], axis=0)

    coords = [boxes[:, i].reshape(num_tiles, TILE).astype(jnp.float32)
              for i in range(4)]

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=float(iou_threshold),
                          num_tiles=num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
    )(*coords)

    return keep.reshape(-1)[:n] > 0
