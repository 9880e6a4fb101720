"""Single-file serving export: checkpoint → ``model.npz`` → Detector.

    python -m retinanet_tpu.export --experiment /tmp/exp \
        --backbone mobilenet_v2 --scale 256 \
        --class-names square,triangle,circle --out model.npz

    python -m retinanet_tpu.detect img.png --from-export model.npz --out d/

The export packs the FULL parameter pytree (exact leaf paths, exact
values) plus the serving metadata (backbone, class names, canvas size)
into one ``.npz`` — a deployment artifact that needs neither the Orbax
experiment directory nor the training-side config to serve.  The
reference's only persistence was TF estimator checkpoints tied to the
training graph (``/root/reference/train.py:246-277``); it had no
deployable serving artifact at all.
"""

from __future__ import annotations

import argparse
import json
import logging
from typing import Dict, List, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

_META_KEY = "__retinanet_tpu_meta__"


def _leaf_path(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def export_model(params, class_names: List[str], backbone: str,
                 image_size: int, path: str, dtype: str = "float32") -> int:
    """Write params + metadata as one npz; returns the leaf count.

    ``dtype="bfloat16"`` stores float leaves as bf16 (half the artifact
    size; serving casts weights to the compute dtype anyway, and load
    restores float32 views).  Non-float leaves keep their dtype.

    The file always lands at a ``.npz`` path (np.savez appends the
    extension itself — normalizing here keeps the logged path, the --out
    argument, and the actual file identical).
    """
    if not path.endswith(".npz"):
        path += ".npz"
    bf16_leaves: List[str] = []

    def leaf(name, v):
        v = np.asarray(v)
        if dtype == "bfloat16" and np.issubdtype(v.dtype, np.floating):
            import ml_dtypes
            # np.savez silently degrades extension dtypes to raw void
            # records ('|V2'), so bf16 travels as its uint16 bit pattern
            # and the leaf list in meta says which arrays to view back.
            bf16_leaves.append(name)
            return v.astype(ml_dtypes.bfloat16).view(np.uint16)
        return v

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays: Dict[str, np.ndarray] = {
        _leaf_path(p): leaf(_leaf_path(p), v) for p, v in flat}
    meta = {"format": "retinanet_tpu_export_v1",
            "backbone": backbone,
            "image_size": int(image_size),
            "dtype": dtype,
            "bf16_leaves": bf16_leaves,
            "class_names": list(class_names)}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    np.savez(path, **arrays)
    logger.info("exported %d param tensors + meta to %s", len(flat), path)
    return len(flat)


def read_meta(path: str) -> dict:
    """Read just the metadata record of an export file."""
    data = np.load(path)
    if _META_KEY not in data:
        raise ValueError(f"{path} is not a retinanet_tpu export "
                         f"(missing {_META_KEY})")
    return json.loads(bytes(data[_META_KEY]).decode())


def load_exported(path: str) -> Tuple[dict, object, List[str], int]:
    """→ (meta, params pytree, class_names, image_size).

    The pytree is rebuilt by initializing the model structure on a tiny
    dummy (fully convolutional ⇒ shape-free) and replacing every leaf by
    its exact exported path — a bitwise round-trip, no name heuristics.
    """
    import jax.numpy as jnp

    from retinanet_tpu.config import Config, ModelConfig
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.ops.anchors import build_levels

    data = np.load(path)
    meta = read_meta(path)
    class_names = list(meta["class_names"])

    config = Config()
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(
        ModelConfig(backbone=meta["backbone"],
                    num_classes=len(class_names)),
        num_anchors=levels.num_anchors, num_classes=len(class_names))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          training=False)["params"]

    missing: List[str] = []
    bf16_set = set(meta.get("bf16_leaves", ()))

    def replace(p, leaf):
        name = _leaf_path(p)
        if name not in data:
            missing.append(name)
            return leaf
        stored = data[name]
        if name in bf16_set:
            import ml_dtypes
            stored = stored.view(ml_dtypes.bfloat16)
        if stored.shape != leaf.shape:
            raise ValueError(f"{name}: exported shape {stored.shape} != "
                             f"model shape {leaf.shape}")
        # bf16-stored artifacts come back at the model's param dtype
        # (float32) — every bf16 value is exactly representable in f32.
        return jnp.asarray(stored).astype(leaf.dtype)

    params = jax.tree_util.tree_map_with_path(replace, template)
    if missing:
        raise ValueError(f"export {path} is missing {len(missing)} params "
                         f"(first: {missing[:3]})")
    return meta, params, class_names, int(meta["image_size"])


def load_exported_detector(path: str, config=None, mesh=None,
                           use_pallas=None):
    """Build a ready Detector from an export file.

    ``config`` (optional) overrides serving knobs (nms thresholds, batch
    size, quantize); model/class metadata always comes from the export.
    """
    from retinanet_tpu.config import Config, _apply_dotted
    from retinanet_tpu.infer import Detector

    meta, params, class_names, image_size = load_exported(path)
    if config is None:
        config = Config()
        config = _apply_dotted(config, "data.image_size", image_size)
    config = _apply_dotted(config, "model.backbone", meta["backbone"])
    config = _apply_dotted(config, "model.num_classes", len(class_names))
    return Detector(config, params, class_names, use_pallas=use_pallas,
                    mesh=mesh)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="export a checkpoint as a single-file serving artifact")
    parser.add_argument("--experiment", type=str, required=True)
    parser.add_argument("--backbone", type=str, default="resnet_50")
    parser.add_argument("--scale", type=int, default=600,
                        help="serving canvas size recorded in the artifact")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument(
        "--class-names", type=str, default=None,
        help="comma-separated class names (order = training class ids)")
    parser.add_argument(
        "--dataset", type=str, nargs="+", default=None,
        help="alternative to --class-names: take names from a dataset spec")
    parser.add_argument("--out", type=str, required=True, metavar="PATH.npz")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype for float params (bfloat16 "
                             "halves the artifact size; serving computes "
                             "in bf16 regardless)")
    parser.add_argument("--platform", type=str, default=None, metavar="NAME",
                        help="pin JAX to a platform (e.g. 'cpu') in-process")
    args = parser.parse_args(argv)

    from retinanet_tpu.utils.cli import force_platform
    force_platform(args.platform)

    from retinanet_tpu.detect import _Names, _resolve_class_names
    class_names = _resolve_class_names(args)

    from retinanet_tpu.config import Config, _apply_dotted
    config = Config()
    for dotted, value in [
        ("data.image_size", args.scale),
        ("model.backbone", args.backbone),
        ("train.experiment", args.experiment),
    ]:
        config = _apply_dotted(config, dotted, value)

    from retinanet_tpu.evaluate import load_detector
    detector = load_detector(config, _Names(class_names), args.step)
    export_model(detector.params, class_names, args.backbone, args.scale,
                 args.out, dtype=args.dtype)


if __name__ == "__main__":
    main()
