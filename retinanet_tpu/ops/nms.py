"""Static-shape detection decode + NMS.

The reference decodes with a dynamic boolean mask (prob > 0.5,
``utils.py:183-195``) and loops per class over TF's C++ NMS op
(``utils.py:198-220``).  Neither shape-dynamic masking nor a sequential C++
op exists on TPU, so this module re-designs the path with static shapes:

  * per-level top-k candidates (scores below the threshold keep their slot
    but are marked invalid) instead of boolean_mask
  * classwise NMS via **coordinate offsetting**: boxes are shifted by
    ``class_id * offset`` so boxes of different classes can never overlap —
    one batched NMS call is exactly equivalent to the reference's per-class
    loop
  * greedy NMS itself as the standard O(N²) suppression-matrix algorithm:
    one pairwise-IoU matrix (MXU/VPU friendly) + a ``fori_loop`` over sorted
    candidates updating an active mask — bit-exact greedy semantics with a
    fully static shape

``retinanet_tpu.ops.pallas.nms_kernel`` provides the fused TPU kernel for
the suppression loop; this module is the reference implementation and
fallback, and the kernel is verified against it.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from retinanet_tpu.config import NMSConfig
from retinanet_tpu.ops import boxes as box_ops
from retinanet_tpu.ops.anchors import Levels


class BoxesDecoded(NamedTuple):
    """Padded detections (reference ``BoxesDecoded`` namedtuple + validity)."""

    boxes: Array      # [..., K, 4] corner, image-relative
    scores: Array     # [..., K]
    class_ids: Array  # [..., K] int32
    valid: Array      # [..., K] bool


def classmap_decode(classmap: Array, threshold: float = 0.5) -> Array:
    """fg_mask = max class prob > threshold (reference ``utils.py:171-177``)."""
    return jnp.max(classmap, axis=-1) > threshold


def _select_level_candidates(classifications: Array, top_k: int,
                             approx: bool, approx_recall: float):
    """(scores [B,k], class_ids [B,k], flat_idx [B,k]) of one level's top-k
    candidates — the single dense pass shared by :func:`decode_level` and
    :func:`fused_decode_nms` (see decode_level's docstring for the
    packed-key design)."""
    b, h, w, a = classifications.shape[:4]
    num_classes = classifications.shape[4]
    n = h * w * a
    k = min(top_k, n)

    def select(flat_map: Array):
        # Exact or TPU-PartialReduce approximate top-k of a [B, n] map
        # (unsorted is fine — NMS re-sorts exactly downstream).
        if approx and k < n:
            return jax.lax.approx_max_k(flat_map, k,
                                        recall_target=approx_recall)
        return jax.lax.top_k(flat_map, k)

    packed_path = (classifications.dtype == jnp.bfloat16
                   and num_classes <= 128)
    if packed_path:
        u = jax.lax.bitcast_convert_type(
            classifications, jnp.uint16).astype(jnp.int32)
        sign = u >> 15
        # Monotone uint16 key: order(key) == order(bf16 value).
        key = jnp.where(sign == 1, u ^ 0xFFFF, u | 0x8000)
        cls_rank = 127 - jnp.arange(num_classes, dtype=jnp.int32)
        packed = (key << 7) + cls_rank          # < 2^23: exact in f32
        best = jnp.max(packed, axis=-1).astype(jnp.float32)
        top_packed, top_idx = select(best.reshape(b, -1))
        pk = top_packed.astype(jnp.int32)
        ids = 127 - (pk & 127)
        key_t = pk >> 7
        u16 = jnp.where((key_t & 0x8000) != 0, key_t ^ 0x8000,
                        key_t ^ 0xFFFF).astype(jnp.uint16)
        top_logits = jax.lax.bitcast_convert_type(
            u16, jnp.bfloat16).astype(jnp.float32)
    else:
        best_logit = jnp.max(classifications, axis=-1).astype(jnp.float32)
        top_logits, top_idx = select(best_logit.reshape(b, -1))
        # Class ids from the k gathered logit rows (k·C ≪ dense volume).
        rows = jnp.take_along_axis(
            classifications.reshape(b, n, num_classes),
            top_idx[..., None], axis=1)                      # [B,k,C]
        ids = jnp.argmax(rows, axis=-1).astype(jnp.int32)
    return jax.nn.sigmoid(top_logits), ids, top_idx


def decode_level(
    classifications: Array,  # [B, H, W, A, C] logits
    regressions: Array,      # [B, H, W, A, 4]
    anchor_sizes: Array,     # [A, 2] normalized
    top_k: int,
    score_threshold: float,
    approx: bool = False,
    approx_recall: float = 0.95,
) -> BoxesDecoded:
    """Top-k candidates of one pyramid level (replaces boolean-mask decode).

    Sparse decode: top-k runs on the raw max-logit map (sigmoid is monotone,
    so max-prob order == max-logit order) and only the k winners are
    sigmoided and box-decoded — the dense-map version materialized fp32
    probs + a full [B,H,W,A,4] decoded boxmap (≈5 extra HBM passes of the
    class volume per level, measured ~13 ms of the 83 ms b32@640 inference).
    Anchor geometry is reconstructed arithmetically from the flat index, so
    nothing dense is gathered.  Semantics identical to
    ``regression_postprocess`` (reference ``utils.py:116-126``).

    HBM discipline (the whole stage is bandwidth-bound; decode+NMS was
    measured at 45 ms / 45 GB of the 265 ms b128@640 pipeline):

    * bf16 logits with ≤128 classes take the **packed-key path**: the
      dense volume is read exactly once by a max-reduction over an
      integer packing ``(monotone16(logit) << 7) | (127 − class)`` that is
      exactly representable in f32 (< 2²³) — one pass yields the best
      logit AND its argmax class, with bit-exact argmax semantics
      (lowest class index on ties).  No dense argmax, no [B,k,C] row
      gather (TPU gathers measured 7-12 ms each at b128).
    * otherwise (f32 inputs, wide-class configs) the volume is read once
      by a max and the class comes from gathered top-k rows.
    """
    b, h, w, a = classifications.shape[:4]
    n = h * w * a
    scores, ids, top_idx = _select_level_candidates(
        classifications, top_k, approx, approx_recall)

    regr = jnp.take_along_axis(
        regressions.reshape(b, n, 4),
        top_idx[..., None], axis=1).astype(jnp.float32)      # [B,k,4]

    # Flat index = (y·W + x)·A + a → anchor center/size without dense maps.
    ai = top_idx % a
    cell = top_idx // a
    cy = ((cell // w).astype(jnp.float32) + 0.5) / h
    cx = ((cell % w).astype(jnp.float32) + 0.5) / w
    asz = anchor_sizes.astype(jnp.float32)[ai]               # [B,k,2]
    shift, log_scale = jnp.split(regr, 2, axis=-1)
    center = shift * asz + jnp.stack([cy, cx], axis=-1)
    size = jnp.exp(log_scale) * asz
    boxes = box_ops.from_center_box(
        jnp.concatenate([center, size], axis=-1))
    return BoxesDecoded(
        boxes=boxes,
        scores=scores,
        class_ids=ids,
        valid=scores > score_threshold,
    )


def decode_levels(
    classifications: Dict[str, Array],
    regressions: Dict[str, Array],
    levels: Levels,
    image_size: int,
    cfg: NMSConfig = NMSConfig(),
) -> BoxesDecoded:
    """Decode + merge all pyramid levels (reference ``train.py:68-74``)."""
    parts = []
    for pn in sorted(classifications.keys()):
        anchor_sizes = jnp.asarray(
            levels.normalized_anchor_sizes(pn, image_size))
        parts.append(decode_level(
            classifications[pn], regressions[pn], anchor_sizes,
            cfg.top_k_per_level, cfg.score_threshold,
            approx=cfg.use_approx_top_k,
            approx_recall=cfg.approx_top_k_recall))
    return BoxesDecoded(
        boxes=jnp.concatenate([p.boxes for p in parts], axis=1),
        scores=jnp.concatenate([p.scores for p in parts], axis=1),
        class_ids=jnp.concatenate([p.class_ids for p in parts], axis=1),
        valid=jnp.concatenate([p.valid for p in parts], axis=1),
    )


def _greedy_keep_mask(boxes: Array, scores: Array,
                      iou_threshold: float) -> Array:
    """Exact greedy NMS keep-mask for score-sorted boxes ([N,4], [N])."""
    n = boxes.shape[0]
    iou = box_ops.pairwise_iou(boxes, boxes)
    idx = jnp.arange(n)

    def body(i, active):
        suppress = (iou[i] > iou_threshold) & (idx > i) & active[i]
        return active & ~suppress

    active = jax.lax.fori_loop(0, n, body, jnp.ones(n, bool))
    return active


def _greedy_keep_mask_jacobi(boxes: Array, iou_threshold: float) -> Array:
    """Exact greedy NMS keep-mask via fixed-point iteration ([B,N,4] → [B,N]).

    Greedy NMS on score-sorted boxes is the recursion

        keep[i] = not any(keep[j] and iou[j, i] > thr  for j < i)

    whose solution is unique (strong induction on i): ANY fixed point of the
    equation IS the greedy answer.  So instead of the fori_loop's N
    sequential [N]-sized steps (measured 5.5 ms at b128/N=1000 — the
    serialization, not the math, is the cost), run Jacobi sweeps

        keep ← not (keep @ S)    with  S[j, i] = (j < i) and iou[j, i] > thr

    until a sweep changes nothing.  Each sweep is one [B,N]×[B,N,N] masked
    matvec; after sweep t the first t+1 entries are provably at their final
    values, so it converges in at most N sweeps — in practice the longest
    *suppression chain* (a handful on real detector output, since classwise
    offsetting zeroes cross-class IoU).  The while_loop's data-dependent
    trip count is fine on TPU (it is outside any vmap).

    Measured in-model at the serving config (b128@640, N=1000) this LOSES
    to the sequential loop (533.4 vs 542.0 img/s): the extra [B,N,N] bf16
    mask materialization plus per-sweep re-reads cost more HBM time than
    the fori_loop's serialization.  Kept selectable for small-N /
    small-batch configs where the matrix fits cache-like reuse.

    bf16 is safe for the matvec: we only test >0, and a sum of
    non-negative bf16 terms with any positive term stays positive.
    """
    b, n, _ = boxes.shape
    iou = jax.vmap(box_ops.pairwise_iou, in_axes=(0, 0))(boxes, boxes)
    tri = jnp.triu(jnp.ones((n, n), jnp.bool_), k=1)  # rows j < cols i
    s = ((iou > iou_threshold) & tri).astype(jnp.bfloat16)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < n, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        sup = jnp.einsum("bj,bji->bi", keep.astype(jnp.bfloat16), s,
                         preferred_element_type=jnp.float32) > 0
        return (~sup, keep, it + 1)

    keep0 = jnp.ones((b, n), jnp.bool_)
    state = (keep0, jnp.zeros((b, n), jnp.bool_), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, state)
    return keep


def nms_padded(
    decoded: BoxesDecoded,
    iou_threshold: float = 0.5,
    max_output_size: int = 1000,
    classwise: bool = True,
    use_pallas: Optional[bool] = None,
    pre_nms_top_k: Optional[int] = None,
    suppression: str = "sequential",
) -> BoxesDecoded:
    """Batched, static-shape (class-wise) NMS over padded candidates.

    Exactly the reference's greedy semantics (``utils.py:198-220``): per
    class, IoU 0.5, at most ``max_output_size`` survivors, descending score.
    Invalid candidates participate with score −1 and a far-away coordinate
    offset, so they can neither win nor suppress.  ``pre_nms_top_k`` caps the
    (score-sorted) candidates entering suppression.
    """
    n = decoded.scores.shape[-1]
    k_in = min(pre_nms_top_k or n, n)

    def sort_one(boxes, scores, class_ids, valid):
        scores = jnp.where(valid, scores, -1.0)
        top_scores, order = jax.lax.top_k(scores, k_in)
        boxes_s = boxes[order]
        ids_s = class_ids[order]
        valid_s = top_scores > 0

        shifted = boxes_s
        if classwise:
            # Different classes never overlap after offsetting.
            shifted = shifted + (ids_s[:, None] * 4.0).astype(boxes.dtype)
        # Park invalid boxes far away so they don't suppress anyone.
        shifted = jnp.where(valid_s[:, None], shifted, shifted - 1e4)
        return boxes_s, top_scores, ids_s, valid_s, shifted

    boxes_s, scores_s, ids_s, valid_s, shifted = jax.vmap(sort_one)(
        decoded.boxes, decoded.scores, decoded.class_ids, decoded.valid)

    if use_pallas:
        from retinanet_tpu.ops.pallas.nms_kernel import nms_keep_mask_batch
        keep = nms_keep_mask_batch(shifted, iou_threshold)
    elif suppression == "jacobi":
        keep = _greedy_keep_mask_jacobi(shifted, iou_threshold)
    else:
        keep = jax.vmap(
            lambda b, s: _greedy_keep_mask(b, s, iou_threshold))(
                shifted, scores_s)
    keep = keep & valid_s

    def select_one(boxes, scores, ids, keep):
        out_scores = jnp.where(keep, scores, -1.0)
        k = min(max_output_size, out_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(out_scores, k)
        return BoxesDecoded(
            boxes=boxes[top_idx],
            scores=jnp.where(top_scores > 0, top_scores, 0.0),
            class_ids=ids[top_idx],
            valid=top_scores > 0,
        )

    return jax.vmap(select_one)(boxes_s, scores_s, ids_s, keep)


def fused_decode_nms(
    classifications: Dict[str, Array],
    regressions: Dict[str, Array],
    levels: Levels,
    image_size,
    cfg: NMSConfig = NMSConfig(),
    use_pallas: bool = False,
) -> BoxesDecoded:
    """Decode + classwise NMS with the box work deferred past the pre-NMS
    selection — the serving hot path.

    ``decode_levels`` + ``nms_padded`` (the semantic reference, kept for
    tests and generality) gather regressions and decode boxes for ALL
    ``top_k_per_level × num_levels`` candidates (5000 at defaults), then
    re-gather the boxes when NMS sorts down to ``pre_nms_top_k`` (1000).
    TPU gathers dominate the decode cost (NOTES round 3: 4.7 ms for the
    5000-row regression gather alone at b128), so here:

      1. per-level candidate selection produces only (score, class, flat
         index) — no boxes;
      2. the global pre-NMS top-k runs on the merged scores (invalid →
         −1, exactly ``nms_padded``'s ordering);
      3. regressions are gathered ONCE for the k survivors from the
         level-concatenated [B, N, 4] map, and anchor geometry comes from
         a host-precomputed [N, 4] table (``flat_anchor_maps``) — 5× fewer
         gathered rows and no boxes-re-sort gather;
      4. suppression + final selection are shared with ``nms_padded``.

    Bit-equivalent to the reference path (equality-tested) apart from
    score ties straddling the pre-NMS boundary (both paths break such
    ties by merged candidate position; identical there too).
    """
    names = sorted(classifications.keys())
    parts = [_select_level_candidates(classifications[pn],
                                      cfg.top_k_per_level,
                                      cfg.use_approx_top_k,
                                      cfg.approx_top_k_recall)
             for pn in names]
    scores = jnp.concatenate([p[0] for p in parts], axis=1)   # [B, K]
    ids = jnp.concatenate([p[1] for p in parts], axis=1)

    # Candidate index into the canonical level-concatenated flat anchor
    # space (static per-level offsets).
    offsets = []
    off = 0
    for pn in names:
        gh, gw = levels.grid_hw(pn, image_size)
        offsets.append(off)
        off += gh * gw * levels.num_anchors
    gidx = jnp.concatenate(
        [p[2] + o for p, o in zip(parts, offsets)], axis=1)   # [B, K]

    b = scores.shape[0]
    valid = scores > cfg.score_threshold
    masked = jnp.where(valid, scores, -1.0)
    k_in = min(cfg.pre_nms_top_k, masked.shape[1])
    if cfg.use_approx_global_top_k and k_in < masked.shape[1]:
        # Same approximation contract as the per-level selection: the TPU
        # PartialReduce unit picks ≥recall of the true global top-k;
        # aggregate_to_topk (the default) still returns them exactly
        # sorted, which the greedy suppression ordering requires.
        top_scores, order = jax.lax.approx_max_k(
            masked, k_in, recall_target=cfg.approx_top_k_recall)
    else:
        top_scores, order = jax.lax.top_k(masked, k_in)       # [B, k]
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    gidx_s = jnp.take_along_axis(gidx, order, axis=1)
    valid_s = top_scores > 0

    # One [B, k, 4] gather of the surviving regressions + a small-table
    # anchor lookup; then the same decode math as decode_level.
    regr_all = jnp.concatenate(
        [regressions[pn].reshape(b, -1, 4) for pn in names], axis=1)
    regr = jnp.take_along_axis(regr_all, gidx_s[..., None],
                               axis=1).astype(jnp.float32)
    from retinanet_tpu.ops.anchors import flat_anchor_maps
    table = jnp.asarray(flat_anchor_maps(levels, image_size))  # [N, 4]
    anchors = table[gidx_s]                                    # [B, k, 4]
    a_pos, a_size = jnp.split(anchors, 2, axis=-1)
    shift, log_scale = jnp.split(regr, 2, axis=-1)
    center = shift * a_size + a_pos
    size = jnp.exp(log_scale) * a_size
    boxes_s = box_ops.from_center_box(
        jnp.concatenate([center, size], axis=-1))

    shifted = boxes_s + (ids_s[..., None] * 4.0).astype(boxes_s.dtype)
    shifted = jnp.where(valid_s[..., None], shifted, shifted - 1e4)

    if use_pallas:
        from retinanet_tpu.ops.pallas.nms_kernel import nms_keep_mask_batch
        keep = nms_keep_mask_batch(shifted, cfg.iou_threshold)
    elif cfg.suppression == "jacobi":
        keep = _greedy_keep_mask_jacobi(shifted, cfg.iou_threshold)
    else:
        keep = jax.vmap(
            lambda bx, s: _greedy_keep_mask(bx, s, cfg.iou_threshold))(
                shifted, top_scores)
    keep = keep & valid_s

    def select_one(boxes, scores, ids, keep):
        out_scores = jnp.where(keep, scores, -1.0)
        k = min(cfg.max_output_size, out_scores.shape[0])
        sel_scores, sel_idx = jax.lax.top_k(out_scores, k)
        return BoxesDecoded(
            boxes=boxes[sel_idx],
            scores=jnp.where(sel_scores > 0, sel_scores, 0.0),
            class_ids=ids[sel_idx],
            valid=sel_scores > 0,
        )

    return jax.vmap(select_one)(boxes_s, top_scores, ids_s, keep)
