"""Debug-mode validation (reference §5 "race detection" analog).

The reference embeds runtime assertion ops in the graph unconditionally —
box validity inside ``iou`` (``utils.py:65-68``), IoU range checks
(``utils.py:94``), loader asserts (``inferred.py:30-32``).  On TPU,
always-on in-graph asserts would poison fusion and add sync points, so the
TPU-native design is: **checkify in debug mode, nothing in the compiled fast
path**.  Loader-level validation stays on host (``Inferred``).

Usage::

    from retinanet_tpu.utils import debug
    err, out = debug.checked_iou(a, b)   # debug builds
    debug.validate_boxes_host(np_boxes)   # host-side, pipelines/tests
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import checkify

from retinanet_tpu.ops import boxes as box_ops


def _iou_with_checks(a: Array, b: Array) -> Array:
    checkify.check(jnp.all(a[..., :2] <= a[..., 2:]),
                   "iou: box `a` has tl > br")
    checkify.check(jnp.all(b[..., :2] <= b[..., 2:]),
                   "iou: box `b` has tl > br")
    out = box_ops.iou(a, b)
    checkify.check(jnp.all(out >= 0.0) & jnp.all(out <= 1.0),
                   "iou out of [0, 1]")
    return out


def checked_iou(a: Array, b: Array):
    """IoU with the reference's validity checks, checkify-functionalized so
    it still jits; returns ``(error, value)``."""
    return checkify.checkify(_iou_with_checks)(a, b)


def validate_boxes_host(boxes: np.ndarray, image_size: float = 1.0) -> None:
    """Host-side strict validation for pipelines and tests."""
    boxes = np.asarray(boxes)
    if boxes.ndim != 2 or boxes.shape[-1] != 4:
        raise ValueError(f"boxes must be [N,4], got {boxes.shape}")
    tl, br = boxes[:, :2], boxes[:, 2:]
    if not np.all(tl <= br):
        raise ValueError(f"degenerate boxes (tl > br): {boxes[(tl > br).any(1)]}")
    if not np.all((boxes >= -image_size) & (boxes <= 2 * image_size)):
        raise ValueError("boxes far outside the image bounds")


def checked_call(fn, *args):
    """Run any jittable fn under checkify with all standard error sets and
    raise on error — the debug entry point for tests."""
    err, out = checkify.checkify(
        fn, errors=checkify.all_checks)(*args)
    err.throw()
    return out
