"""Tests for pytree helpers, debug validation, summaries, pretrained
import/export, and drawing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.utils import debug
from retinanet_tpu.utils.pytree import (
    dict_map, dict_starmap, dict_update, flatten_levels, unflatten_levels)
from retinanet_tpu.utils.summaries import MetricsWriter, prob_histograms


def test_dict_helpers():
    d = {"a": 1, "b": 2}
    assert dict_map(lambda x: x * 2, d) == {"a": 2, "b": 4}
    assert dict_starmap(lambda x, y: x + y, [d, d]) == {"a": 2, "b": 4}
    nested = {"x": {"y": 1}}
    out = dict_update(nested, ["x", "y"], lambda v: v + 10)
    assert out == {"x": {"y": 11}}
    assert nested == {"x": {"y": 1}}  # functional


def test_flatten_unflatten_levels():
    d = {"P3": jnp.ones((2, 4, 4, 9, 3)), "P4": jnp.zeros((2, 2, 2, 9, 3))}
    flat = flatten_levels(d)
    assert flat.shape == (2, 4 * 4 * 9 + 2 * 2 * 9, 3)
    # P3 first in canonical order.
    np.testing.assert_allclose(np.asarray(flat[:, 0]), 1.0)
    back = unflatten_levels(flat, d)
    for k in d:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(d[k]))


def test_flatten_levels_mask():
    d = {"P3": jnp.ones((2, 4, 4, 9), bool)}
    flat = flatten_levels(d)
    assert flat.shape == (2, 144)


def test_checked_iou_passes_valid():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    err, out = debug.checked_iou(a, b)
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), [0.25])


def test_checked_iou_catches_degenerate():
    a = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])  # tl > br
    b = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    err, _ = debug.checked_iou(a, b)
    with pytest.raises(Exception):
        err.throw()


def test_validate_boxes_host():
    debug.validate_boxes_host(np.array([[0, 0, 1, 1]], np.float32))
    with pytest.raises(ValueError):
        debug.validate_boxes_host(np.array([[1, 1, 0, 0]], np.float32))


def test_prob_histograms():
    targets = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]]])  # [1, 2, 2]
    probs = jnp.asarray([[[0.95, 0.04], [0.5, 0.5]]])
    mask = jnp.ones((1, 2), bool)
    out = prob_histograms(targets, probs, mask)
    fg = np.asarray(out["prob_fg_hist"])
    bg = np.asarray(out["prob_bg_hist"])
    assert fg.sum() == 1  # one fg entry
    assert bg.sum() == 3
    assert fg[19] == 1  # 0.95 in last bin
    assert bg[0] == 1   # 0.04 in first bin
    assert bg[10] == 2  # two 0.5 entries


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 0.5, "hist": np.arange(3)})
    w.close()
    import json
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).readlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 0.5
    assert rec["hist"] == [0, 1, 2]


def test_pretrained_roundtrip(tmp_path):
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.utils.pretrained import (
        import_flat_weights, load_backbone, save_backbone)

    model = RetinaNet(backbone="mobilenet_v2", num_classes=2,
                      dropout_rate=0.0, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, training=False)["params"]

    path = os.path.join(str(tmp_path), "backbone.npz")
    save_backbone(params, path)

    # Zero out the backbone then restore.
    zeroed = {**params, "backbone_net": jax.tree_util.tree_map(
        jnp.zeros_like, params["backbone_net"])}
    restored = load_backbone(zeroed, path)
    orig = jax.tree_util.tree_leaves(params["backbone_net"])
    rest = jax.tree_util.tree_leaves(restored["backbone_net"])
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Flat import: round-trip through a name-erased dict.
    flat = {f"w{i}": np.asarray(v) for i, v in enumerate(orig)}
    imported, report = import_flat_weights(zeroed, flat)
    assert not report["unmatched"]
    # Every leaf got some shape-compatible weight.
    for leaf in jax.tree_util.tree_leaves(imported["backbone_net"]):
        assert np.asarray(leaf).size > 0


def test_import_flat_weights_name_aware():
    """Exact-name matches win regardless of source ordering; remaining
    leaves pair per-shape in natural (numeric-aware) order — the >10
    repeated-layer case where lexicographic order (Conv_10 < Conv_2) would
    cross-wire weights."""
    from retinanet_tpu.utils.pretrained import import_flat_weights

    # 12 same-shape "convs" + one uniquely-shaped bias.
    target = {"net": {f"Conv_{i}": {"kernel": jnp.zeros((3, 3))}
                      for i in range(12)}}
    target["net"]["bias"] = jnp.zeros((7,))

    # Sources named differently (torch-style), in definition order, each
    # tagged with its layer index so we can verify alignment.
    weights = {f"features.{i}.conv.weight": np.full((3, 3), float(i))
               for i in range(12)}
    weights["head.bias"] = np.arange(7, dtype=np.float32)

    out, report = import_flat_weights(target, weights, subtree="net")
    assert not report["unmatched"]
    assert not report["unused_sources"]
    # Natural order pairing: Conv_i gets layer i (lexicographic flatten
    # order would give Conv_10 the value 2).
    for i in range(12):
        np.testing.assert_array_equal(
            np.asarray(out["net"][f"Conv_{i}"]["kernel"]),
            np.full((3, 3), float(i)), err_msg=f"Conv_{i}")

    # Name-aware pass: shuffled source order + exact (normalized) names
    # must still land each weight on its named target.
    target2 = {"net": {f"block_{i}": {"kernel": jnp.zeros((2, 2))}
                       for i in range(4)}}
    weights2 = {f"block.{i}.kernel": np.full((2, 2), float(i))
                for i in (2, 0, 3, 1)}  # deliberately out of order
    out2, report2 = import_flat_weights(target2, weights2, subtree="net")
    assert len(report2["matched_by_name"]) == 4
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(out2["net"][f"block_{i}"]["kernel"]),
            np.full((2, 2), float(i)))


def test_draw_bounding_boxes():
    from retinanet_tpu.utils.draw import draw_bounding_boxes
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_bounding_boxes(img, np.array([[0.1, 0.1, 0.9, 0.9]]),
                              np.array([0]), ["thing"])
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
    assert out.max() > 0  # something was drawn


def test_step_timer():
    from retinanet_tpu.utils.profiling import StepTimer
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    stats = t.stats(batch_size=4)
    assert "images_per_sec" in stats and stats["images_per_sec"] > 0


def test_platform_flag_parses_and_forces_cpu():
    """--platform plumbs through config_from_args / force_platform.  The
    conftest already pins jax_platforms='cpu', so forcing 'cpu' again must
    be a visible no-op (and prove the flag reaches jax.config)."""
    import jax

    from retinanet_tpu.config import config_from_args
    from retinanet_tpu.utils.cli import force_platform

    force_platform(None)  # no-op path
    cfg = config_from_args([
        "--dataset", "shapes", "/tmp/x", "8", "64",
        "--experiment", "/tmp/e", "--platform", "cpu"])
    assert cfg.data.dataset[0] == "shapes"
    assert jax.config.jax_platforms == "cpu"
