"""Dict/pytree helpers (reference ``/root/reference/utils.py:151-167,230-246``)
plus the level-flattening that replaces the reference's dynamic
``boolean_mask`` + concat (``utils.py:270-278``) with a static reshape+concat.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax.numpy as jnp
from jax import Array

# Canonical level ordering for deterministic concatenation.
LEVEL_ORDER = ("P3", "P4", "P5", "P6", "P7")


def dict_map(f: Callable, d: Dict) -> Dict:
    """Reference ``utils.py:160-161``."""
    return {k: f(d[k]) for k in d}


def dict_starmap(f: Callable, dicts: Sequence[Dict]) -> Dict:
    """Reference ``utils.py:164-167``."""
    keys = dicts[0].keys()
    assert all(d.keys() == keys for d in dicts)
    return {k: f(*[d[k] for d in dicts]) for k in keys}


def dict_update(d: Dict, keys: List[str], f: Callable) -> Dict:
    """Reference ``utils.py:230-236``: functional nested-dict update."""
    if not keys:
        return f(d)
    return {**d, keys[0]: dict_update(d[keys[0]], keys[1:], f)}


def sorted_levels(d: Dict[str, Array]) -> List[str]:
    return [k for k in LEVEL_ORDER if k in d]


def flatten_levels(d: Dict[str, Array], batch_dims: int = 1) -> Array:
    """Concat per-level maps [..., H, W, A, T] → [..., N_total, T].

    Static-shape replacement for the reference's ``merge_outputs`` over
    boolean-masked levels (``utils.py:151, 270-278``): instead of selecting
    trainable anchors dynamically, flatten everything and let the loss weight
    by the (equally flattened) trainable mask.
    """
    flat = []
    for k in sorted_levels(d):
        v = d[k]
        lead = v.shape[:batch_dims]
        trail = v.shape[batch_dims:]
        if len(trail) == 3:  # [H, W, A] mask — no trailing feature dim
            flat.append(v.reshape(*lead, -1))
        else:  # [H, W, A, T]
            flat.append(v.reshape(*lead, -1, trail[-1]))
    return jnp.concatenate(flat, axis=batch_dims)


def unflatten_levels(x: Array, template: Dict[str, Array],
                     batch_dims: int = 1) -> Dict[str, Array]:
    """Inverse of :func:`flatten_levels` given a template of level shapes."""
    out = {}
    offset = 0
    for k in sorted_levels(template):
        shape = template[k].shape
        h, w, a = shape[batch_dims], shape[batch_dims + 1], shape[batch_dims + 2]
        n = h * w * a
        sl = x[(slice(None),) * batch_dims + (slice(offset, offset + n),)]
        out[k] = sl.reshape(*shape[:batch_dims + 3], *x.shape[batch_dims + 1:])
        offset += n
    return out
