"""Data pipeline + loader tests (Shapes is the offline fixture, SURVEY §4)."""

import numpy as np

from retinanet_tpu.config import DataConfig
from retinanet_tpu.data.loaders.inferred import Inferred
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.data.pipeline import (
    Batch, Pipeline, build_pipeline, compute_mean_std, process_sample)


def _cfg(**kw):
    base = dict(dataset=("shapes",), image_size=64, batch_size=2,
                shuffle_buffer=8, augment_flip=False, num_workers=2,
                prefetch=1)
    base.update(kw)
    return DataConfig(**base)


def test_shapes_loader_valid_and_deterministic():
    dl = Shapes(None, 8, (64, 64), seed=7)
    samples1 = list(dl)
    samples2 = list(dl)
    assert len(samples1) == 8
    for s1, s2 in zip(samples1, samples2):
        np.testing.assert_array_equal(s1["image"], s2["image"])
        np.testing.assert_array_equal(s1["boxes"], s2["boxes"])
        # boxes valid: t<b, l<r within canvas
        t, l, b, r = s1["boxes"].T
        assert np.all(t < b) and np.all(l < r)
        assert np.all(t >= 0) and np.all(b <= 64)
        assert s1["class_ids"].shape[0] == s1["boxes"].shape[0] > 0


def test_inferred_dispatch_and_validation():
    dl = Inferred("shapes", [None, "4", "64"])
    assert dl.num_classes == 3
    assert dl.class_names == ["square", "triangle", "circle"]
    assert len(list(dl)) == 4


def test_process_sample_static_shapes():
    image = np.zeros((100, 50, 3), np.uint8)
    sample = {"image": image,
              "boxes": np.array([[10, 10, 60, 40]], np.float32),
              "class_ids": np.array([1], np.int32)}
    out = process_sample(sample, 64, np.zeros(3, np.float32),
                         np.ones(3, np.float32), max_boxes=10, flip=False)
    assert out["image"].shape == (64, 64, 3)
    assert out["boxes"].shape == (10, 4)
    assert out["box_mask"].sum() == 1
    # Longer side (100) scaled to 64 → scale 0.64.
    np.testing.assert_allclose(out["scale"], 0.64, atol=1e-6)
    # Box scaled: t=10*0.64/64=0.1, l=0.1, b=0.6, r=0.4.
    np.testing.assert_allclose(out["boxes"][0], [0.1, 0.1, 0.6, 0.4],
                               atol=1e-2)


def test_process_sample_flip():
    image = np.zeros((64, 64, 3), np.uint8)
    image[:, :32] = 255  # left half white
    sample = {"image": image,
              "boxes": np.array([[0, 0, 64, 32]], np.float32),
              "class_ids": np.array([0], np.int32)}
    out = process_sample(sample, 64, np.zeros(3, np.float32),
                         np.ones(3, np.float32), max_boxes=4, flip=True)
    # White half now on the right; box covers right half.
    assert out["image"][:, 48:].mean() > out["image"][:, :16].mean()
    np.testing.assert_allclose(out["boxes"][0], [0, 0.5, 1.0, 1.0],
                               atol=1e-6)


def test_photometric_jitter():
    from retinanet_tpu.data.pipeline import photometric_jitter
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    # Identity factors → unchanged.
    np.testing.assert_array_equal(
        photometric_jitter(image, 1.0, 1.0, 1.0), image)
    # Brightness scales pixel means (away from clipping).
    dim = photometric_jitter(image, 0.5, 1.0, 1.0)
    np.testing.assert_allclose(dim.mean(), image.mean() * 0.5, rtol=0.02)
    # Saturation 0 → grayscale (channels equal up to rounding).
    gray = photometric_jitter(image, 1.0, 1.0, 0.0).astype(np.int32)
    assert np.abs(gray[..., 0] - gray[..., 1]).max() <= 1
    # Contrast 0 → constant image at the mean luma.
    flat = photometric_jitter(image, 1.0, 0.0, 1.0)
    assert np.ptp(flat) <= 1
    # Output stays uint8 and in range under extreme factors.
    hot = photometric_jitter(image, 2.0, 2.0, 2.0)
    assert hot.dtype == np.uint8


def test_pipeline_photometric_augment_applied_and_reproducible():
    dl = Shapes(None, 6, (64, 64))
    cfg_on = _cfg(augment_photometric=True, photometric_strength=0.5,
                  shuffle_buffer=1)
    cfg_off = _cfg(shuffle_buffer=1)
    on1 = list(Pipeline(dl, cfg_on, max_boxes=8, seed=3).epoch(0))
    on2 = list(Pipeline(dl, cfg_on, max_boxes=8, seed=3).epoch(0))
    off = list(Pipeline(dl, cfg_off, max_boxes=8, seed=3).epoch(0))
    # Deterministic given the seed…
    for a, b in zip(on1, on2):
        np.testing.assert_array_equal(a.images, b.images)
    # …and actually changes pixels vs the unaugmented pipeline.
    assert any(not np.array_equal(a.images, b.images)
               for a, b in zip(on1, off))
    # Boxes are untouched by photometric jitter.
    for a, b in zip(on1, off):
        np.testing.assert_array_equal(a.boxes, b.boxes)


def test_pipeline_batches():
    dl = Shapes(None, 10, (64, 64))
    pipe = build_pipeline(dl, _cfg(), max_boxes=8)
    batches = list(pipe.epoch(0))
    assert len(batches) == 5  # 10 samples / batch 2
    for b in batches:
        assert isinstance(b, Batch)
        assert b.images.shape == (2, 64, 64, 3)
        assert b.boxes.shape == (2, 8, 4)
        assert b.class_ids.shape == (2, 8)
        assert b.box_mask.shape == (2, 8)
        assert b.box_mask.any(axis=1).all()  # every sample has a box


def test_pipeline_pair_flip_batching():
    """Reference-parity batch construction (``dataset.py:182-204``): every
    image appears with its horizontal flip as adjacent batch entries."""
    import pytest

    dl = Shapes(None, 6, (64, 64), seed=5)
    cfg = _cfg(batch_size=4, shuffle_buffer=1, pair_flip_batching=True,
               transfer_uint8=False)
    pipe = Pipeline(dl, cfg, max_boxes=8, seed=3)
    assert len(pipe) == 3  # 6 images x 2 orientations / batch 4
    batches = list(pipe.epoch(0))
    assert len(batches) == 3
    for b in batches:
        for i in range(0, 4, 2):
            assert b.image_ids[i] == b.image_ids[i + 1]
            # Second entry is the mirror of the first (exact: mirroring
            # commutes with the resize because the source is mirrored
            # before resampling and W maps onto the canvas exactly here).
            np.testing.assert_array_equal(b.images[i + 1],
                                          b.images[i][:, ::-1])
            m = b.box_mask[i]
            np.testing.assert_array_equal(m, b.box_mask[i + 1])
            t, l, bb, r = b.boxes[i][m].T
            t2, l2, b2, r2 = b.boxes[i + 1][m].T
            np.testing.assert_allclose(t2, t, atol=1e-6)
            np.testing.assert_allclose(b2, bb, atol=1e-6)
            np.testing.assert_allclose(l2, 1.0 - r, atol=1e-6)
            np.testing.assert_allclose(r2, 1.0 - l, atol=1e-6)

    with pytest.raises(ValueError, match="even batch_size"):
        Pipeline(dl, _cfg(batch_size=3, pair_flip_batching=True),
                 max_boxes=8)
    # Eval pipelines ignore the flag (training-only construction).
    ev = Pipeline(dl, cfg, max_boxes=8, training=False)
    assert len(ev) == 1  # 6 images / batch 4, no doubling


def test_pipeline_prefetched_matches_epoch():
    dl = Shapes(None, 6, (64, 64))
    pipe = Pipeline(dl, _cfg(shuffle_buffer=1), max_boxes=8, training=False)
    direct = list(pipe.epoch(0))
    prefetched = list(pipe.prefetched(0))
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.boxes, b.boxes)


def test_pipeline_shuffle_changes_order_across_epochs():
    dl = Shapes(None, 16, (32, 32))
    pipe = Pipeline(dl, _cfg(batch_size=4, shuffle_buffer=16), max_boxes=8,
                    training=True, seed=3)
    ids0 = np.concatenate([b.image_ids for b in pipe.epoch(0)])
    ids1 = np.concatenate([b.image_ids for b in pipe.epoch(1)])
    assert sorted(ids0.tolist()) == sorted(ids1.tolist())
    assert ids0.tolist() != ids1.tolist()


def test_compute_mean_std():
    dl = Shapes(None, 4, (32, 32))
    mean, std = compute_mean_std(dl)
    assert mean.shape == (3,) and std.shape == (3,)
    assert np.all(mean > 0) and np.all(mean < 1)
    assert np.all(std > 0)


def test_flip_assign_commutes():
    """assign(flipped sample) == flip_labels(assign(sample)) — validates the
    host flip math against the reference's label-space flip."""
    import jax.numpy as jnp
    from retinanet_tpu.ops import assign
    from retinanet_tpu.ops.augment import flip_labels
    from retinanet_tpu.ops.anchors import build_levels

    levels = build_levels()
    # Dyadic coordinates: exactly representable in binary so 1-r introduces
    # no rounding and threshold comparisons mirror exactly.
    boxes = np.array([[0.125, 0.25, 0.5, 0.4375]], np.float32)
    ids = np.array([1], np.int32)
    mask = np.ones(1, bool)

    # Flip boxes horizontally: l' = 1 - r, r' = 1 - l.
    fboxes = boxes.copy()
    fboxes[:, 1] = 1 - boxes[:, 3]
    fboxes[:, 3] = 1 - boxes[:, 1]

    size = 64
    cls_a, regr_a, mask_a = assign.build_labels(
        jnp.asarray(fboxes), jnp.asarray(ids), jnp.asarray(mask),
        size, levels, 3)
    cls_b, regr_b, mask_b = assign.build_labels(
        jnp.asarray(boxes), jnp.asarray(ids), jnp.asarray(mask),
        size, levels, 3)
    cls_b, regr_b, mask_b = flip_labels(cls_b, regr_b, mask_b)

    for k in cls_a:
        np.testing.assert_allclose(np.asarray(cls_a[k]),
                                   np.asarray(cls_b[k]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(regr_a[k]),
                                   np.asarray(regr_b[k]), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(mask_a[k]),
                                      np.asarray(mask_b[k]))


def test_process_sample_rect_canvas():
    from retinanet_tpu.data.pipeline import process_sample
    image = np.zeros((100, 50, 3), np.uint8)
    sample = {"image": image,
              "boxes": np.array([[10, 10, 60, 40]], np.float32),
              "class_ids": np.array([1], np.int32)}
    out = process_sample(sample, (64, 128), np.zeros(3, np.float32),
                         np.ones(3, np.float32), max_boxes=10, flip=False)
    assert out["image"].shape == (64, 128, 3)
    # scale = min(64/100, 128/50) = 0.64 → resized 64×32.
    np.testing.assert_allclose(out["scale"], 0.64, atol=1e-6)
    # Boxes normalized per-dim: t=10*0.64/64=0.1, l=10*0.64/128=0.05,
    # b=60*0.64/64=0.6, r=40*0.64/128=0.2.
    np.testing.assert_allclose(out["boxes"][0], [0.1, 0.05, 0.6, 0.2],
                               atol=1e-2)


def test_pick_bucket():
    from retinanet_tpu.data.pipeline import pick_bucket
    buckets = ((64, 64), (64, 32), (32, 64))
    assert pick_bucket(100, 50, buckets) == (64, 32)   # tall image
    assert pick_bucket(50, 100, buckets) == (32, 64)   # wide image
    assert pick_bucket(80, 80, buckets) == (64, 64)    # square image


def test_pipeline_buckets_homogeneous_batches():
    # Mix of tall and wide images → batches grouped per bucket shape.
    class MixedLoader:
        class_names = ["a"]
        num_classes = 1

        def __len__(self):
            return 8

        def __iter__(self):
            rng = np.random.RandomState(0)
            for i in range(8):
                h, w = (80, 40) if i % 2 == 0 else (40, 80)
                yield {
                    "image": rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
                    "boxes": np.array([[5, 5, 20, 20]], np.float32),
                    "class_ids": np.array([0], np.int32),
                }

    cfg = _cfg(batch_size=2, shuffle_buffer=1,
               buckets=((64, 64), (64, 32), (32, 64)))
    batches = list(Pipeline(MixedLoader(), cfg, max_boxes=4,
                            training=False).epoch(0))
    assert len(batches) == 4
    shapes = sorted({b.images.shape[1:3] for b in batches})
    assert shapes == [(32, 64), (64, 32)]
    for b in batches:  # batches are homogeneous
        assert b.images.shape[0] == 2


def test_training_pipeline_uint8_transfer():
    """Training batches ship as uint8 (transfer_uint8 default); eval-mode
    pipelines stay normalized float."""
    dl = Shapes(None, 4, (64, 64))
    train_b = next(iter(Pipeline(dl, _cfg(shuffle_buffer=1), max_boxes=8,
                                 training=True).epoch(0)))
    assert train_b.images.dtype == np.uint8
    eval_b = next(iter(Pipeline(dl, _cfg(shuffle_buffer=1), max_boxes=8,
                                training=False).epoch(0)))
    assert eval_b.images.dtype == np.float32
    # Same pixels, two encodings: normalizing the uint8 batch must
    # reproduce the float batch (resize runs on uint8 in both paths).
    mean = np.asarray(_cfg().mean, np.float32)
    std = np.asarray(_cfg().std, np.float32)
    renorm = (train_b.images.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(renorm, eval_b.images, atol=2e-2)


def test_process_sample_scale_jitter():
    """Zoom-out jitter: resize factor (and therefore the rendered extent
    AND the normalized boxes) shrink together — labels stay consistent
    with the canvas; jitter 1.0 is the identity."""
    image = np.full((100, 50, 3), 200, np.uint8)
    sample = {"image": image,
              "boxes": np.array([[10, 10, 60, 40]], np.float32),
              "class_ids": np.array([1], np.int32)}
    mean, std = np.zeros(3, np.float32), np.ones(3, np.float32)

    base = process_sample(sample, 64, mean, std, max_boxes=10, flip=False)
    same = process_sample(sample, 64, mean, std, max_boxes=10, flip=False,
                          scale_jitter=1.0)
    np.testing.assert_array_equal(base["image"], same["image"])
    np.testing.assert_array_equal(base["boxes"], same["boxes"])

    half = process_sample(sample, 64, mean, std, max_boxes=10, flip=False,
                          scale_jitter=0.5)
    np.testing.assert_allclose(half["scale"], 0.32, atol=1e-6)  # 0.64*0.5
    np.testing.assert_allclose(half["boxes"][0], base["boxes"][0] * 0.5,
                               atol=1e-6)
    # Rendered content shrinks to 32x16; padding beyond is the zero pixel.
    assert half["image"][:32, :16].mean() > half["image"][40:, 20:].mean()
    assert np.allclose(half["image"][40:, 20:], half["image"][63, 63])


def test_pipeline_scale_jitter_applied_and_reproducible():
    dl = Shapes(None, 6, (64, 64))
    cfg_on = _cfg(augment_scale_jitter=0.5, shuffle_buffer=1)
    cfg_off = _cfg(shuffle_buffer=1)
    on1 = list(Pipeline(dl, cfg_on, max_boxes=8, seed=3).epoch(0))
    on2 = list(Pipeline(dl, cfg_on, max_boxes=8, seed=3).epoch(0))
    off = list(Pipeline(dl, cfg_off, max_boxes=8, seed=3).epoch(0))
    for a, b in zip(on1, on2):  # deterministic under the seed
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.boxes, b.boxes)
    # Jitter shrinks at least some boxes vs the unjittered pipeline.
    assert any(not np.array_equal(a.boxes, b.boxes)
               for a, b in zip(on1, off))
    # Shrink only: every jittered box extent <= the unjittered extent.
    for a, b in zip(on1, off):
        ah = (a.boxes[..., 2] - a.boxes[..., 0])[a.box_mask]
        bh = (b.boxes[..., 2] - b.boxes[..., 0])[b.box_mask]
        assert (ah <= bh + 1e-6).all()


def test_pipeline_rejects_out_of_range_scale_jitter():
    import pytest

    dl = Shapes(None, 4, (64, 64))
    with pytest.raises(ValueError, match="augment_scale_jitter"):
        Pipeline(dl, _cfg(augment_scale_jitter=1.5), max_boxes=8)


def test_scheduled_canvases_deterministic_across_processes():
    """Two pipelines over DIFFERENT dataset shards with DIFFERENT
    per-process seeds but a shared schedule_seed must yield the same
    canvas sequence (the multi-process agreement property), consume every
    sample (no per-bucket remainder drops), and stay batch-homogeneous."""

    class MixedLoader:
        class_names = ["a"]
        num_classes = 1

        def __init__(self, offset):
            self.offset = offset

        def __len__(self):
            return 12

        def __iter__(self):
            rng = np.random.RandomState(100 + self.offset)
            for i in range(12):
                h, w = (80, 40) if (i + self.offset) % 3 else (40, 80)
                yield {
                    "image": rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
                    "boxes": np.array([[5, 5, 20, 20]], np.float32),
                    "class_ids": np.array([0], np.int32),
                }

    cfg = _cfg(batch_size=2, shuffle_buffer=4,
               buckets=((64, 64), (64, 32), (32, 64)))
    seqs = []
    for proc in range(2):
        pipe = Pipeline(MixedLoader(proc), cfg, max_boxes=4, training=True,
                        seed=42 + proc, scheduled_canvases=True,
                        schedule_seed=42)
        batches = list(pipe.epoch(0))
        assert len(batches) == 6  # 12 samples / batch 2 — nothing dropped
        for b in batches:
            assert b.images.shape[0] == 2
        seqs.append([b.images.shape[1:3] for b in batches])
    assert seqs[0] == seqs[1]
    assert len(set(seqs[0])) > 1  # the schedule actually mixes canvases
    # A different epoch draws a different (but still shared) sequence.
    pipe = Pipeline(MixedLoader(0), cfg, max_boxes=4, training=True,
                    seed=42, scheduled_canvases=True, schedule_seed=42)
    assert [b.images.shape[1:3] for b in pipe.epoch(1)] != seqs[0]
