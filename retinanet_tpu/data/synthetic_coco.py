"""Synthetic COCO-format dataset generator — readiness drill tooling.

Writes a real on-disk COCO-style dataset (JPEG files + ``instances.json``)
with the properties that stress the COCO path before real data exists
(reference analog: ``/root/reference/data_loaders/coco.py:26-58``):

  * rectangular image sizes spanning several aspect ratios (exercises
    resolution buckets)
  * drawn rectangles/circles whose ground-truth boxes are exact (so a
    trained model produces meaningful detections)
  * crowd annotations (``iscrowd=1`` regions) and segmentation ``area``
    fields that differ from the bbox area
  * 20+ categories with non-contiguous category ids

Use :func:`generate` from tests or the ``python -m
retinanet_tpu.data.synthetic_coco`` CLI.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

# (h, w) source-size pool: portrait / landscape / square, mixed scales.
DEFAULT_SIZES: Sequence[Tuple[int, int]] = (
    (480, 640), (640, 480), (512, 512), (360, 640), (640, 360), (424, 640),
)


def _class_color(class_index: int, num_classes: int,
                 rng: np.random.RandomState) -> Tuple[int, int, int]:
    """Deterministic hue per class (+ small jitter) — classes are visually
    LEARNABLE (hue × shape), so the drill tests end-to-end learning on
    COCO-format data, not just the data path.  (Round-5 finding: with
    random colors the 20 'classes' reduce to 2 visual classes and the
    classifier correctly learns nothing — class loss plateaus at chance.)
    """
    import colorsys
    hue = (class_index / num_classes + rng.uniform(-0.015, 0.015)) % 1.0
    r, g, b = colorsys.hsv_to_rgb(hue, rng.uniform(0.75, 1.0),
                                  rng.uniform(0.75, 1.0))
    return int(r * 255), int(g * 255), int(b * 255)


def generate(out_dir: str, num_images: int = 1000, num_classes: int = 20,
             seed: int = 0, sizes: Sequence[Tuple[int, int]] = DEFAULT_SIZES,
             crowd_prob: float = 0.1, max_objects: int = 8,
             image_size_divisor: int = 1,
             learnable_classes: bool = True) -> Tuple[str, str]:
    """Write the dataset; returns (annotation_json_path, image_dir).

    Category ids are spaced (1, 3, 5, ...) to exercise dense re-indexing.
    Crowd annotations are larger regions containing several drawn objects.
    ``learnable_classes=False`` restores the pre-round-5 random-color mode
    (appearance independent of category — a pure format/scale drill).
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("cv2 required to write JPEG fixtures") from e

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    cat_ids = [1 + 2 * i for i in range(num_classes)]
    categories = [{"id": cid, "name": f"class_{cid}"} for cid in cat_ids]

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        h, w = sizes[rng.randint(len(sizes))]
        h -= h % image_size_divisor
        w -= w % image_size_divisor
        canvas = np.full((h, w, 3), rng.randint(40, 216, 3), np.uint8)

        n_obj = rng.randint(1, max_objects + 1)
        for _ in range(n_obj):
            k = rng.randint(num_classes)
            cat = cat_ids[k]
            ow = rng.randint(max(8, w // 16), max(12, w // 3))
            oh = rng.randint(max(8, h // 16), max(12, h // 3))
            left = rng.randint(0, max(1, w - ow))
            top = rng.randint(0, max(1, h - oh))
            color = (_class_color(k, num_classes, rng) if learnable_classes
                     else tuple(int(c) for c in rng.randint(0, 255, 3)))
            if cat % 4 == 1:
                cv2.rectangle(canvas, (left, top), (left + ow, top + oh),
                              color, -1)
                seg_area = float(ow * oh)
            else:
                cv2.ellipse(canvas, (left + ow // 2, top + oh // 2),
                            (ow // 2, oh // 2), 0, 0, 360, color, -1)
                seg_area = float(np.pi * (ow / 2) * (oh / 2))
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cat,
                "bbox": [float(left), float(top), float(ow), float(oh)],
                "area": seg_area,  # segmentation area != bbox area
                "iscrowd": 0,
            })
            ann_id += 1

        if rng.rand() < crowd_prob:
            # A crowd region covering a random quadrant-ish area.
            cw, chh = rng.randint(w // 3, w // 2 + 1), \
                rng.randint(h // 3, h // 2 + 1)
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - chh)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": cat_ids[rng.randint(num_classes)],
                "bbox": [float(left), float(top), float(cw), float(chh)],
                "area": float(cw * chh) * 0.7,
                "iscrowd": 1,
            })
            ann_id += 1

        name = f"im{i:05d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), canvas[..., ::-1])
        images.append({"id": i + 1, "file_name": name,
                       "width": int(w), "height": int(h)})

    ann_path = os.path.join(out_dir, "instances.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "categories": categories,
                   "annotations": annotations}, f)
    return ann_path, img_dir


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num-images", type=int, default=1000)
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--crowd-prob", type=float, default=0.1)
    p.add_argument("--random-colors", action="store_true",
                   help="pre-round-5 mode: object color independent of "
                        "category (classes visually unlearnable — a pure "
                        "format/scale drill)")
    args = p.parse_args(argv)
    ann, imgs = generate(args.out_dir, args.num_images, args.num_classes,
                         args.seed, crowd_prob=args.crowd_prob,
                         learnable_classes=not args.random_colors)
    print(json.dumps({"annotations": ann, "images": imgs}))


if __name__ == "__main__":
    main()
