"""Label-space augmentation ops (reference ``/root/reference/augmentation.py``).

The pipeline flips *samples* (image + boxes) before on-device label
assignment, so flipping label maps is not needed on the hot path.  This op is
kept because (a) it is part of the reference's capability surface and (b) it
yields a strong invariance test: ``assign(flip(sample)) ==
flip_labels(assign(sample))``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from jax import Array


def flip_image(image: Array) -> Array:
    """Horizontal flip of an NHWC (or HWC) image."""
    return jnp.flip(image, axis=-2)


def flip_labels(
    classifications: Dict[str, Array],  # [..., H, W, A, C]
    regressions: Dict[str, Array],      # [..., H, W, A, 4]
    trainable_masks: Dict[str, Array],  # [..., H, W, A]
) -> Tuple[Dict[str, Array], Dict[str, Array], Dict[str, Array]]:
    """Flip per-level label maps along W and negate regression x-shifts
    (reference ``augmentation.py:5-22``)."""
    def flip_w(x: Array, w_axis_from_end: int) -> Array:
        return jnp.flip(x, axis=x.ndim - w_axis_from_end)

    out_cls = {k: flip_w(v, 3) for k, v in classifications.items()}
    out_masks = {k: flip_w(v, 2) for k, v in trainable_masks.items()}
    out_regr = {}
    for k, v in regressions.items():
        v = flip_w(v, 3)
        y, x, h, w = jnp.split(v, 4, axis=-1)
        out_regr[k] = jnp.concatenate([y, -x, h, w], axis=-1)
    return out_cls, out_regr, out_masks
