"""Pipeline visualizer CLI (reference ``/root/reference/debug_input.py``).

Builds the real input pipeline on the Shapes dataset, runs the on-device
label assignment, and renders per-level × per-anchor grids of classmaps,
trainable masks, and decoded ground-truth boxes to PNG files (no display
server assumed; the reference used matplotlib windows).

Usage: ``python -m retinanet_tpu.debug_input --out /tmp/debug_viz``
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import Config, DataConfig
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.data.pipeline import build_pipeline
from retinanet_tpu.ops import assign, boxes as box_ops
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.utils.draw import draw_bounding_boxes, draw_classmap

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def render_sample(image, cls, regr, masks, levels, image_size, class_names,
                  out_dir, index):
    os.makedirs(out_dir, exist_ok=True)
    # De-normalize image to [0,1] for display.
    img = (image - image.min()) / max(image.max() - image.min(), 1e-6)

    for pn in levels:
        fg_counts = np.asarray(cls[pn]).max(-1).sum(-1)  # [H, W] anchors w/ fg
        overlay = draw_classmap(img, fg_counts)
        if cv2 is not None:
            cv2.imwrite(os.path.join(out_dir, f"{index}_{pn}_classmap.png"),
                        overlay[..., ::-1])

        # Decode GT regressions of fg anchors back to boxes and draw them.
        anchor_sizes = jnp.asarray(
            levels.normalized_anchor_sizes(pn, image_size))
        decoded = np.asarray(box_ops.regression_postprocess(
            jnp.asarray(regr[pn])[None], anchor_sizes))[0]
        fg = np.asarray(cls[pn]).max(-1) > 0.5
        boxes = decoded[fg]
        ids = np.asarray(cls[pn]).argmax(-1)[fg]
        drawn = draw_bounding_boxes(img, boxes, ids, class_names)
        if cv2 is not None:
            cv2.imwrite(os.path.join(out_dir, f"{index}_{pn}_boxes.png"),
                        drawn[..., ::-1])

        mask_img = (np.asarray(masks[pn]).all(-1) * 255).astype(np.uint8)
        if cv2 is not None:
            cv2.imwrite(os.path.join(out_dir, f"{index}_{pn}_trainable.png"),
                        mask_img)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="/tmp/debug_input")
    parser.add_argument("--num-samples", type=int, default=4)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args(argv)

    config = Config(data=DataConfig(image_size=args.size, batch_size=1,
                                    augment_flip=False))
    levels = build_levels(config.anchors)
    loader = Shapes(None, args.num_samples, (args.size, args.size))
    pipe = build_pipeline(loader, config.data, training=False)

    for i, batch in enumerate(pipe.epoch(0)):
        cls, regr, masks = assign.build_labels(
            jnp.asarray(batch.boxes[0]), jnp.asarray(batch.class_ids[0]),
            jnp.asarray(batch.box_mask[0]), args.size, levels,
            loader.num_classes)
        render_sample(batch.images[0], cls, regr, masks, levels, args.size,
                      loader.class_names, args.out, i)
        print(f"rendered sample {i} -> {args.out}")


if __name__ == "__main__":
    main()
