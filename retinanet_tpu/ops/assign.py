"""On-device anchor↔ground-truth label assignment.

TPU-native re-design of ``/root/reference/dataset.py:16-142``.  The reference
runs this per-image on CPU inside ``tf.data`` with a dynamic ``[OBJECTS, H, W,
A]`` IoU tensor; here it is a jit-compiled, vmap-over-batch function taking a
**static** ``[MAX_BOXES, 4]`` padded box array plus validity mask, so the
whole thing runs on-device as part of the training step and XLA fuses it with
the input normalization.

Semantics preserved exactly (validated in ``tests/test_assign.py``):
  * anchors = cell-center grid × normalized anchor sizes (``dataset.py:55-69``)
  * match   = argmax IoU over objects, first-wins on ties (``dataset.py:76-78``)
  * bg      = iou < POS threshold — the reference's quirk where background
    uses the positive threshold (``dataset.py:83``; paper behaviour via
    ``AssignConfig.bg_uses_pos_threshold=False``)
  * trainable (non-ignored) = iou < 0.4 or iou >= 0.5 (``dataset.py:87``)
  * classification = one-hot of matched class, zeroed where bg
    (``dataset.py:91-100``)
  * regression = (shift, log-scale) of the matched object vs the anchor
    (``dataset.py:104-121``) — defined for every anchor, fg-masked by the loss
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from retinanet_tpu.config import AssignConfig
from retinanet_tpu.ops import boxes as box_ops
from retinanet_tpu.ops.anchors import Levels


def _match(anchor_corner: Array, boxes: Array, box_mask: Array,
           chunk: int) -> Tuple[Array, Array]:
    """(max IoU, first-wins argmax index) of every anchor over the padded
    GT boxes.

    ``chunk == 0``: the direct formulation — materialize the full
    ``[H, W, A, MAX_BOXES]`` IoU tensor and reduce it twice.  At train
    scale that tensor dominates the whole assignment cost (b16@640,
    MAX_BOXES=100: ~0.5 GB per elementwise intermediate; assignment
    measured 24.5 ms of a 131 ms step — see NOTES round 3).

    ``chunk > 0``: ``lax.scan`` over GT-box chunks carrying a running
    ``(best_iou, best_idx)`` per anchor.  Each step fuses the IoU math of
    one ``[H, W, A, chunk]`` slab into its own max/argmax, so nothing
    box-wide ever hits HBM; the carried state is only ``[H, W, A]``.
    Bit-exact vs the direct path: ``max`` is order-independent for floats,
    and the strict ``>`` update keeps the EARLIER chunk on ties, matching
    ``jnp.argmax``'s first-wins semantics (property-tested in
    ``tests/test_assign.py``).
    """
    if chunk <= 0:
        iou = box_ops.iou(anchor_corner[..., None, :],
                          boxes[None, None, None, :, :])
        # Padded boxes must never win the argmax nor raise the max.
        iou = jnp.where(box_mask[None, None, None, :], iou, -1.0)
        return jnp.max(iou, axis=-1), jnp.argmax(iou, axis=-1)

    n = boxes.shape[0]
    pad = (-n) % chunk
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        box_mask = jnp.pad(box_mask, (0, pad))
    steps = (n + pad) // chunk
    spatial = anchor_corner.shape[:-1]

    def body(carry, xs):
        best_iou, best_idx = carry
        b, m, offset = xs
        iou = box_ops.iou(anchor_corner[..., None, :],
                          b[None, None, None, :, :])
        iou = jnp.where(m[None, None, None, :], iou, -1.0)
        c_iou = jnp.max(iou, axis=-1)
        c_idx = offset + jnp.argmax(iou, axis=-1).astype(jnp.int32)
        better = c_iou > best_iou
        return (jnp.where(better, c_iou, best_iou),
                jnp.where(better, c_idx, best_idx)), None

    init = (jnp.full(spatial, -jnp.inf, jnp.float32),
            jnp.zeros(spatial, jnp.int32))
    offsets = jnp.arange(steps, dtype=jnp.int32) * chunk
    (match_iou, match_idx), _ = jax.lax.scan(
        body, init,
        (boxes.reshape(steps, chunk, 4), box_mask.reshape(steps, chunk),
         offsets))
    # All-padded input: the direct path yields (iou=-1, idx=0); the scan's
    # first chunk always beats the -inf init with exactly those values.
    return match_iou, match_idx


def level_labels(
    boxes: Array,            # [MAX_BOXES, 4] corner (t,l,b,r), image-relative
    class_ids: Array,        # [MAX_BOXES] int32
    box_mask: Array,         # [MAX_BOXES] bool — True for real boxes
    anchor_sizes: Array,     # [A, 2] image-relative anchor (h, w)
    grid_h: int,
    grid_w: int,
    num_classes: int,
    cfg: AssignConfig = AssignConfig(),
) -> Tuple[Array, Array, Array]:
    """Assign labels for one pyramid level of one image.

    Returns ``(classification [H,W,A,C] f32, regression [H,W,A,4] f32,
    trainable_mask [H,W,A] bool)``.
    """
    num_anchors = anchor_sizes.shape[0]

    # [H, W, 1, 2] cell centers; [H, W, A, 4] anchor center boxes.
    grid = box_ops.position_grid(grid_h, grid_w)[:, :, None, :]
    anchor_pos = jnp.broadcast_to(grid, (grid_h, grid_w, num_anchors, 2))
    anchor_size = jnp.broadcast_to(
        anchor_sizes[None, None].astype(jnp.float32),
        (grid_h, grid_w, num_anchors, 2))
    anchor_corner = box_ops.from_center_box(
        jnp.concatenate([anchor_pos, anchor_size], axis=-1))

    match_iou, match_idx = _match(anchor_corner, boxes, box_mask,
                                  cfg.match_chunk)

    bg_threshold = (cfg.pos_iou_threshold if cfg.bg_uses_pos_threshold
                    else cfg.neg_iou_threshold)
    bg_mask = match_iou < bg_threshold
    trainable_mask = jnp.logical_or(match_iou < cfg.neg_iou_threshold,
                                    match_iou >= cfg.pos_iou_threshold)

    # Select the matched class one-hot and the matched center box in ONE
    # one-hot × table matmul instead of two per-anchor gathers.  TPU
    # gathers at this index count are the dominant assignment cost
    # (measured b16@640: class gather +10.5 ms, box gather +8.9 ms, vs
    # 6.5 ms for the whole IoU match — NOTES round 3); the MXU does the
    # same selection in <1 ms.  Exact: the selector rows are exact 0/1
    # with a single 1, so each output is one table row reproduced
    # bit-for-bit (Precision.HIGHEST's bf16-triple split reconstructs
    # f32 exactly; 0·x terms vanish exactly).
    center_boxes = box_ops.to_center_box(boxes)   # [MAX_BOXES, 4]
    class_onehot = jax.nn.one_hot(class_ids, num_classes,
                                  dtype=jnp.float32)  # [MAX_BOXES, C]
    table = jnp.concatenate([class_onehot, center_boxes], axis=-1)
    selector = (match_idx[..., None]
                == jnp.arange(boxes.shape[0])).astype(jnp.float32)
    selected = jax.lax.dot_general(
        selector, table, (((selector.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)      # [H, W, A, C+4]
    classification = selected[..., :num_classes]
    classification = jnp.where(bg_mask[..., None],
                               jnp.zeros_like(classification), classification)

    # Regression: encode the matched object's center box against each anchor
    # (the reference's [OBJECTS, H, W, A, 4] broadcast + one-hot reduce,
    # dataset.py:105-121, as O(H*W*A) work).
    matched_box = selected[..., num_classes:]     # [H, W, A, 4]
    matched_pos, matched_size = jnp.split(matched_box, 2, axis=-1)
    # Padded boxes have zero size: clamp before log; values at such anchors
    # are always bg/ignored and fg-masked out by the loss.
    safe_size = jnp.maximum(matched_size, 1e-8)
    shifts = (matched_pos - anchor_pos) / anchor_size
    regression = jnp.concatenate(
        [shifts, jnp.log(safe_size / anchor_size)], axis=-1)

    return classification, regression, trainable_mask


def build_labels(
    boxes: Array,
    class_ids: Array,
    box_mask: Array,
    image_size: int,
    levels: Levels,
    num_classes: int,
    cfg: AssignConfig = AssignConfig(),
) -> Tuple[Dict[str, Array], Dict[str, Array], Dict[str, Array]]:
    """Per-level labels for one image (reference ``dataset.py:126-142``).

    Returns ``(classifications, regressions, trainable_masks)`` dicts keyed by
    P3..P7.  ``image_size`` is the static canvas — an int (square) or an
    (h, w) pair (bucketed rectangular canvases); grid per level is
    ``ceil(side / 2**k)`` per dimension.
    """
    classifications, regressions, masks = {}, {}, {}
    for pn in levels:
        gh, gw = levels.grid_hw(pn, image_size)
        anchor_sizes = jnp.asarray(levels.normalized_anchor_sizes(pn, image_size))
        c, r, m = level_labels(
            boxes, class_ids, box_mask, anchor_sizes, gh, gw, num_classes,
            cfg)
        classifications[pn], regressions[pn], masks[pn] = c, r, m
    return classifications, regressions, masks


def build_labels_batch(
    boxes: Array,        # [B, MAX_BOXES, 4]
    class_ids: Array,    # [B, MAX_BOXES]
    box_mask: Array,     # [B, MAX_BOXES]
    image_size: int,
    levels: Levels,
    num_classes: int,
    cfg: AssignConfig = AssignConfig(),
):
    """vmap of :func:`build_labels` over the batch dimension."""
    fn = lambda b, c, m: build_labels(
        b, c, m, image_size, levels, num_classes, cfg)
    return jax.vmap(fn)(boxes, class_ids, box_mask)
