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

    # IoU of every anchor against every (padded) GT box: [H, W, A, MAX_BOXES].
    iou = box_ops.iou(anchor_corner[..., None, :], boxes[None, None, None, :, :])
    # Padded boxes must never win the argmax nor raise the max.
    iou = jnp.where(box_mask[None, None, None, :], iou, -1.0)

    # First-wins argmax over objects, same tie behaviour as tf.argmax(axis=0).
    match_idx = jnp.argmax(iou, axis=-1)          # [H, W, A]
    match_iou = jnp.max(iou, axis=-1)             # [H, W, A]

    bg_threshold = (cfg.pos_iou_threshold if cfg.bg_uses_pos_threshold
                    else cfg.neg_iou_threshold)
    bg_mask = match_iou < bg_threshold
    trainable_mask = jnp.logical_or(match_iou < cfg.neg_iou_threshold,
                                    match_iou >= cfg.pos_iou_threshold)

    # Classification: one-hot of the matched class, zeroed for background.
    matched_class = jnp.take(class_ids, match_idx, axis=0)  # [H, W, A]
    classification = jax.nn.one_hot(matched_class, num_classes,
                                    dtype=jnp.float32)
    classification = jnp.where(bg_mask[..., None],
                               jnp.zeros_like(classification), classification)

    # Regression: encode the matched object's center box against each anchor.
    # Gathering the single matched box replaces the reference's
    # [OBJECTS, H, W, A, 4] broadcast + one-hot reduce (dataset.py:105-121)
    # with O(H*W*A) work.
    center_boxes = box_ops.to_center_box(boxes)   # [MAX_BOXES, 4]
    matched_box = jnp.take(center_boxes, match_idx, axis=0)  # [H, W, A, 4]
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
