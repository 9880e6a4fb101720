"""Backbone weight import/export — making the reference's dead capability
real.

The reference ships ``download_weights.sh`` fetching a TF-slim ResNet
checkpoint but **no code ever restores it** (SURVEY §5: no
``Saver.restore``/``init_from_checkpoint`` anywhere).  Here the hook exists
and is tested:

  * ``save_backbone`` / ``load_backbone``: npz round-trip of just the
    backbone subtree (transfer-learning between experiments)
  * ``import_flat_weights``: map an arbitrary flat ``{name: array}`` dict
    (e.g. converted from torch/TF) onto the backbone param pytree by
    shape-compatible greedy matching in traversal order, with a report of
    what matched
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np


def _flatten_params(params) -> List[Tuple[str, np.ndarray]]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        out.append((name, np.asarray(leaf)))
    return out


def save_backbone(params, path: str) -> None:
    """Save the ``backbone_net`` subtree as an npz archive."""
    backbone = params["backbone_net"]
    arrays = dict(_flatten_params(backbone))
    np.savez(path, **arrays)


def load_backbone(params, path: str):
    """Restore a ``save_backbone`` archive into a matching param pytree.

    Returns a new full-params pytree with the backbone replaced; raises if a
    stored array's name or shape doesn't match.
    """
    data = np.load(path)
    backbone = params["backbone_net"]
    stored = {k: data[k] for k in data.files}

    def replace(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name not in stored:
            raise KeyError(f"checkpoint missing backbone param {name}")
        arr = stored[name]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        return jax.numpy.asarray(arr, dtype=leaf.dtype)

    new_backbone = jax.tree_util.tree_map_with_path(replace, backbone)
    return {**params, "backbone_net": new_backbone}


def import_flat_weights(params, weights: Dict[str, np.ndarray],
                        subtree: str = "backbone_net"):
    """Greedy shape-matched import of foreign weights (torch/TF converts).

    Walks the target subtree in deterministic traversal order; for each leaf
    takes the first unused source array with the same shape.  Returns
    ``(new_params, report)`` where report lists (target, source) matches and
    unmatched targets.
    """
    target = params[subtree]
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    used = set()
    matches, unmatched = [], []
    new_leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        found = None
        for src_name, arr in weights.items():
            if src_name in used:
                continue
            if tuple(arr.shape) == tuple(leaf.shape):
                found = (src_name, arr)
                break
        if found is None:
            unmatched.append(name)
            new_leaves.append(leaf)
        else:
            used.add(found[0])
            matches.append((name, found[0]))
            new_leaves.append(jax.numpy.asarray(found[1], dtype=leaf.dtype))
    new_subtree = jax.tree_util.tree_unflatten(
        treedef, new_leaves)
    report = {"matched": matches, "unmatched": unmatched,
              "unused_sources": [k for k in weights if k not in used]}
    return {**params, subtree: new_subtree}, report
