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
  * ``convert_torch_layout`` / ``convert_tf_layout``: memory-layout
    conversion for foreign checkpoints (torch OIHW → HWIO, torch linear
    [O,I] → [I,O], TF depthwise [H,W,C,M] → [H,W,1,C·M], BN running stats
    dropped) — without this a genuine torch/TF checkpoint zero-matches on
    shapes
  * ``convert_torchvision_resnet50``: exact name mapping from a torchvision
    ``resnet50`` state_dict onto :class:`~retinanet_tpu.models.resnet.
    ResNet50`'s param tree (BN γ/β → GroupNorm γ/β).  Needed because the
    flax block orders its projection conv *first* (``ConvGN_0``) while
    torchvision puts ``downsample`` after ``conv3`` — order-preserving
    shape pairing would cross-wire them.
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


def convert_torch_layout(weights: Dict[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
    """torch → flax memory-layout conversion (names preserved).

    * conv kernels [O, I/g, kH, kW] → HWIO [kH, kW, I/g, O] (covers
      depthwise [C, 1, kH, kW] → [kH, kW, 1, C] too)
    * linear ``*.weight`` [O, I] → [I, O]
    * BatchNorm ``running_mean`` / ``running_var`` / ``num_batches_tracked``
      dropped — GroupNorm has no running statistics, and their [C] shapes
      would otherwise collide with γ/β in shape matching
    """
    out = {}
    for name, arr in weights.items():
        base = name.rsplit(".", 1)[-1]
        if base in ("running_mean", "running_var", "num_batches_tracked"):
            continue
        arr = np.asarray(arr)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2 and base == "weight":
            arr = arr.T
        out[name] = arr
    return out


def convert_tf_layout(weights: Dict[str, np.ndarray]
                      ) -> Dict[str, np.ndarray]:
    """TF/TF-slim → flax layout conversion (names preserved).

    TF conv kernels are already HWIO; depthwise kernels
    [H, W, C, multiplier] become the ``feature_group_count`` form
    [H, W, 1, C·multiplier].  BN moving statistics are dropped (GroupNorm
    backbone has none).
    """
    out = {}
    for name, arr in weights.items():
        low = name.lower()
        if "moving_mean" in low or "moving_variance" in low:
            continue
        arr = np.asarray(arr)
        if arr.ndim == 4 and "depthwise" in low:
            h, w, c, m = arr.shape
            arr = arr.reshape(h, w, 1, c * m)
        out[name] = arr
    return out


#: torchvision resnet50 stage depths (layer1..layer4).
_RESNET50_DEPTHS = (3, 4, 6, 3)


def convert_torchvision_resnet50(state_dict: Dict[str, np.ndarray]
                                 ) -> Dict[str, np.ndarray]:
    """Map a torchvision ``resnet50`` state_dict onto the exact param names
    of :class:`~retinanet_tpu.models.resnet.ResNet50` (OIHW → HWIO on the
    way; BN γ/β land on GroupNorm γ/β; ``fc.*`` and running stats are
    dropped — the backbone has no classifier).

    The result feeds :func:`import_flat_weights`, where every entry matches
    **by name** (pass 1), so repeated same-shape layers can never
    cross-wire.  This makes the reference's dead ``download_weights.sh``
    capability real (``/root/reference/download_weights.sh:1-5``).
    """
    sd = state_dict
    out: Dict[str, np.ndarray] = {}

    def put(prefix: str, conv_w, bn_w, bn_b) -> None:
        out[f"{prefix}/Conv_0/kernel"] = \
            np.asarray(conv_w).transpose(2, 3, 1, 0)
        out[f"{prefix}/GroupNorm_0/gamma"] = np.asarray(bn_w)
        out[f"{prefix}/GroupNorm_0/beta"] = np.asarray(bn_b)

    put("ConvGN_0", sd["conv1.weight"], sd["bn1.weight"], sd["bn1.bias"])
    idx = 0
    for layer, depth in enumerate(_RESNET50_DEPTHS, start=1):
        for b in range(depth):
            src = f"layer{layer}.{b}"
            dst = f"ResNetBottleneck_{idx}"
            # The flax block creates the projection FIRST, so in projected
            # blocks conv1..3 are ConvGN_1..3; otherwise ConvGN_0..2.
            has_proj = f"{src}.downsample.0.weight" in sd
            if has_proj:
                put(f"{dst}/ConvGN_0", sd[f"{src}.downsample.0.weight"],
                    sd[f"{src}.downsample.1.weight"],
                    sd[f"{src}.downsample.1.bias"])
            off = 1 if has_proj else 0
            for k in (1, 2, 3):
                put(f"{dst}/ConvGN_{k - 1 + off}", sd[f"{src}.conv{k}.weight"],
                    sd[f"{src}.bn{k}.weight"], sd[f"{src}.bn{k}.bias"])
            idx += 1
    return out


def _natural_key(name: str):
    """Numeric-aware sort key: ``Conv_2`` < ``Conv_10`` (plain lexicographic
    order — what flax's tree flattening uses — sorts ``Conv_10`` first,
    which silently cross-wires repeated same-shape layers)."""
    import re
    return [int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", name)]


def _name_tokens(name: str) -> tuple:
    """Separator/case-insensitive token sequence for name matching
    (``layer1.0.conv1.weight`` ≡ ``layer1/0/conv1/weight``)."""
    import re
    return tuple(t for t in re.split(r"[^0-9a-zA-Z]+", name.lower()) if t)


def import_flat_weights(params, weights: Dict[str, np.ndarray],
                        subtree: str = "backbone_net"):
    """Name-aware import of foreign weights (torch/TF converts) onto the
    target subtree.  Two passes:

    1. **by name**: targets whose normalized token sequence (case/separator
       insensitive) equals a source name's, with matching shape;
    2. **by shape, order-preserving**: remaining targets in *natural* name
       order (``Conv_2`` before ``Conv_10`` — not flax's lexicographic
       flatten order) are paired with remaining sources of the same shape in
       source insertion order, i-th to i-th.  This fixes the round-1 greedy
       matcher's fragility with >10 repeated same-shape layers.

    Returns ``(new_params, report)``; report lists name/shape matches,
    unmatched targets, and unused sources — callers should check it.
    """
    target = params[subtree]
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    named = []
    for path, leaf in flat:
        named.append(("/".join(str(getattr(p, "key", p)) for p in path),
                      leaf))

    used: set = set()
    assigned: Dict[str, str] = {}
    by_name, by_shape = [], []

    # Pass 1: exact normalized-name matches.
    src_by_tokens: Dict[tuple, List[str]] = {}
    for src_name in weights:
        src_by_tokens.setdefault(_name_tokens(src_name), []).append(src_name)
    for tname, leaf in named:
        for src_name in src_by_tokens.get(_name_tokens(tname), []):
            if src_name not in used and \
                    tuple(weights[src_name].shape) == tuple(leaf.shape):
                assigned[tname] = src_name
                used.add(src_name)
                by_name.append((tname, src_name))
                break

    # Pass 2: per-shape order-preserving pairing, targets in natural order.
    from collections import deque
    src_queues: Dict[tuple, deque] = {}
    for src_name, arr in weights.items():  # insertion order = layer order
        if src_name not in used:
            src_queues.setdefault(tuple(arr.shape), deque()).append(src_name)
    for tname, leaf in sorted(
            ((n, l) for n, l in named if n not in assigned),
            key=lambda kv: _natural_key(kv[0])):
        queue = src_queues.get(tuple(leaf.shape))
        if queue:
            src_name = queue.popleft()
            assigned[tname] = src_name
            used.add(src_name)
            by_shape.append((tname, src_name))

    unmatched = [n for n, _ in named if n not in assigned]
    new_leaves = [
        jax.numpy.asarray(weights[assigned[name]], dtype=leaf.dtype)
        if name in assigned else leaf
        for name, leaf in named]
    new_subtree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    report = {"matched": by_name + by_shape,
              "matched_by_name": by_name,
              "matched_by_shape": by_shape,
              "unmatched": unmatched,
              "unused_sources": [k for k in weights if k not in used]}
    return {**params, subtree: new_subtree}, report


def load_pretrained(params, path: str, backbone: str = ""):
    """``train --init-backbone PATH`` entry: initialize the backbone subtree
    from a foreign or native checkpoint file, dispatching on content.

    * ``.npz`` whose names exactly cover the backbone tree (a
      :func:`save_backbone` artifact) → :func:`load_backbone`;
    * ``.npz`` with foreign flat names → layout-convert then
      :func:`import_flat_weights` (torchvision-resnet50 name mapping when
      the names look like one and the model is the dense ResNet50; generic
      torch OIHW conversion otherwise);
    * ``.pt``/``.pth`` → ``torch.load`` state_dict, then as above.

    Raises if any backbone parameter ends up unmatched — a silent partial
    init is a training-quality landmine.  Returns ``(new_params, report)``
    (report is ``None`` for the exact-name npz path, which is all-or-error
    by construction).  Makes the reference's dead ``download_weights.sh``
    capability real end-to-end (``/root/reference/download_weights.sh:1-5``).
    """
    if path.endswith((".pt", ".pth")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        weights = {k: np.asarray(v) for k, v in sd.items()}
    else:
        data = np.load(path)
        weights = {k: data[k] for k in data.files}
        try:  # exact save_backbone round-trip?
            return load_backbone(params, path), None
        except (KeyError, ValueError):
            pass  # foreign names — fall through to conversion

    looks_torchvision = "layer1.0.conv1.weight" in weights
    if looks_torchvision and backbone == "resnet_50_dense":
        try:
            converted = convert_torchvision_resnet50(weights)
        except KeyError as e:
            raise ValueError(
                f"--init-backbone archive looks like a torchvision resnet50 "
                f"state_dict but is missing {e}; refusing a partial init")
    elif any(k.endswith(".weight") for k in weights):
        converted = convert_torch_layout(weights)
    else:
        converted = weights
    new_params, report = import_flat_weights(params, converted)
    if report["unmatched"]:
        raise ValueError(
            f"--init-backbone left {len(report['unmatched'])} backbone "
            f"params uninitialized (first: {report['unmatched'][:3]}); "
            f"refusing a partial init")
    return new_params, report
