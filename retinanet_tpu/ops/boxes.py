"""Box geometry in pure jax.numpy — static shapes, vmap/jit friendly.

Conventions (same as the reference):
  * corner boxes are ``[..., (t, l, b, r)]`` in image-relative [0, 1] coords
  * center boxes are ``[..., (cy, cx, h, w)]``
  * a "boxmap" is a per-grid-cell, per-anchor tensor ``[..., H, W, A, 4]``
  * regression targets are ``(dy, dx, log_h, log_w)`` relative to the anchor

Behaviour matches the reference implementations at
``/root/reference/utils.py:22-117`` (boxmap transforms, IoU, decode) and
``/root/reference/dataset.py:16-39`` (grids, center/corner conversion),
validated against the golden values in ``utils_test.py`` and
``retinanet_old_test.py``.  Unlike the reference there are no in-graph
assertion ops — degenerate boxes produce IoU 0 and a `checkify`-style debug
validator lives in :mod:`retinanet_tpu.utils.debug`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def to_center_box(box: Array) -> Array:
    """Corner (t,l,b,r) → center (cy,cx,h,w).  Reference ``dataset.py:27-31``."""
    tl, br = jnp.split(box, 2, axis=-1)
    size = br - tl
    return jnp.concatenate([tl + size / 2, size], axis=-1)


def from_center_box(box: Array) -> Array:
    """Center (cy,cx,h,w) → corner (t,l,b,r).  Reference ``dataset.py:34-38``."""
    pos, size = jnp.split(box, 2, axis=-1)
    half = size / 2
    return jnp.concatenate([pos - half, pos + half], axis=-1)


def position_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """[H, W, 2] map of cell-center (y, x) positions in [0, 1].

    Cell centers at ``(i + 0.5) / H`` — identical to the reference's
    ``tf.linspace(cell/2, 1 - cell/2, n)`` (``dataset.py:16-26``).
    Static H/W so the grid constant-folds under jit.
    """
    y = (jnp.arange(height, dtype=dtype) + 0.5) / height
    x = (jnp.arange(width, dtype=dtype) + 0.5) / width
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([yy, xx], axis=-1)


def iou(a: Array, b: Array) -> Array:
    """Elementwise IoU of broadcast-compatible corner boxes.

    Matches ``/root/reference/utils.py:62-105``: non-overlapping or degenerate
    pairs yield exactly 0.  Shapes broadcast; the result drops the final
    coordinate axis.
    """
    y_top = jnp.maximum(a[..., 0], b[..., 0])
    x_left = jnp.maximum(a[..., 1], b[..., 1])
    y_bottom = jnp.minimum(a[..., 2], b[..., 2])
    x_right = jnp.minimum(a[..., 3], b[..., 3])

    inter_h = y_bottom - y_top
    inter_w = x_right - x_left
    invalid = jnp.logical_or(inter_h < 0, inter_w < 0)
    intersection = inter_h * inter_w

    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - intersection
    # Degenerate zero-area pairs divide 0/0 → guard denominator.
    out = intersection / jnp.where(union > 0, union, 1.0)
    return jnp.where(invalid, jnp.zeros_like(out), out)


def pairwise_iou(a: Array, b: Array) -> Array:
    """[N, 4] × [M, 4] → [N, M] IoU matrix (used by NMS and evaluation)."""
    return iou(a[:, None, :], b[None, :, :])


def boxmap_anchor_relative_to_image_relative(regression: Array) -> Array:
    """Add grid-cell center positions to anchor-relative (pos, size) boxmaps.

    ``regression``: [..., H, W, A, 4] center-form boxes whose positions are
    relative to their grid cell.  Reference ``utils.py:22-37``.
    """
    h, w = regression.shape[-4], regression.shape[-3]
    grid = position_grid(h, w, dtype=regression.dtype)[:, :, None, :]  # [H,W,1,2]
    pos, size = jnp.split(regression, 2, axis=-1)
    return jnp.concatenate([pos + grid, size], axis=-1)


def boxmap_center_relative_to_corner_relative(regression: Array) -> Array:
    """Center-form boxmap → corner-form.  Reference ``utils.py:40-45``."""
    return from_center_box(regression)


def anchor_boxmap(height: int, width: int, anchor_sizes: Array) -> Array:
    """[H, W, A, 4] corner boxes of every anchor centered on every cell.

    ``anchor_sizes``: [A, 2] normalized (h, w).  Reference ``utils.py:48-60``
    (which returns [1, H, W, A, 4]; the batch dim here is the caller's vmap).
    """
    a = anchor_sizes.shape[0]
    positions = jnp.zeros((height, width, a, 2), dtype=anchor_sizes.dtype)
    sizes = jnp.broadcast_to(anchor_sizes[None, None], (height, width, a, 2))
    boxmap = jnp.concatenate([positions, sizes], axis=-1)
    boxmap = boxmap_anchor_relative_to_image_relative(boxmap)
    return boxmap_center_relative_to_corner_relative(boxmap)


def scale_regression(regression: Array, anchor_sizes: Array) -> Array:
    """Multiply (dy,dx,h,w) by (ah,aw,ah,aw).  Reference ``utils.py:108-113``."""
    scale = jnp.tile(anchor_sizes, (1, 2))  # [A, 4] = (ah, aw, ah, aw)
    return regression * scale


def regression_postprocess(regression: Array, anchor_sizes: Array) -> Array:
    """Decode raw regression maps into corner boxes.

    ``regression``: [..., H, W, A, 4] raw (dy, dx, log_h, log_w);
    ``anchor_sizes``: [A, 2] normalized.  exp the sizes, scale by anchors, add
    grid centers, convert to corners.  Reference ``utils.py:116-126``.
    """
    shifts, log_scales = jnp.split(regression, 2, axis=-1)
    decoded = jnp.concatenate([shifts, jnp.exp(log_scales)], axis=-1)
    decoded = scale_regression(decoded, anchor_sizes.astype(decoded.dtype))
    decoded = boxmap_anchor_relative_to_image_relative(decoded)
    return boxmap_center_relative_to_corner_relative(decoded)


def encode_boxes(true_center_boxes: Array, anchor_positions: Array,
                 anchor_sizes: Array) -> Array:
    """Encode center-form GT boxes against anchors into regression targets.

    shift = (pos - anchor_pos) / anchor_size; scale = log(size / anchor_size)
    — the label-assignment encoding at ``/root/reference/dataset.py:104-117``.
    All arguments broadcast: returns ``[..., 4]``.
    """
    true_pos, true_size = jnp.split(true_center_boxes, 2, axis=-1)
    shifts = (true_pos - anchor_positions) / anchor_sizes
    scales = true_size / anchor_sizes
    return jnp.concatenate([shifts, jnp.log(scales)], axis=-1)
