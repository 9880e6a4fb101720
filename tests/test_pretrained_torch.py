"""Real-checkpoint import drill (VERDICT r2 #5): a faithful torchvision
``resnet50`` state_dict — exact names, exact shapes, OIHW layout — lands on
:class:`ResNet50` with zero unmatched params, all matched **by name**, and
layout-correct kernels (cross-checked against ``torch.nn.functional.conv2d``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.models.resnet import ResNet50
from retinanet_tpu.utils.pretrained import (
    convert_tf_layout, convert_torch_layout, convert_torchvision_resnet50,
    import_flat_weights)

# torchvision resnet50: (conv name, OIHW shape) built from the published
# architecture — stem 7×7/2 64ch, bottleneck stages (3,4,6,3) of widths
# (64,128,256,512) with 4× expansion, 1×1 downsample projections.
_DEPTHS = (3, 4, 6, 3)
_WIDTHS = (64, 128, 256, 512)


def synth_torchvision_resnet50(seed=0, realistic=False):
    """Synthesize a state_dict with torchvision's exact key set + shapes.

    ``realistic=False`` (unit tests): unscaled randn everywhere — scaling is
    irrelevant to the key/shape/layout mapping under test, and distinct
    values per tensor catch transposition bugs.  ``realistic=True``
    (convergence experiments): kaiming-scaled convs, γ≈1 / β≈0 norms — the
    statistics real trained torchvision weights have, so an imported-init
    training run measures the import *plumbing*, not the pathology of
    std-1.0 convs (round-4 NOTES: the unscaled variant trains to mAP 0.05
    vs scratch 0.62 — proof the import is applied, not a plumbing verdict).
    """
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(shape):
        w = rng.randn(*shape).astype(np.float32)
        if realistic:  # kaiming fan_in = in_ch * kh * kw (OIHW)
            w *= np.sqrt(2.0 / (shape[1] * shape[2] * shape[3]))
        return w

    def bn(prefix, c):
        if realistic:
            sd[f"{prefix}.weight"] = (
                1.0 + 0.05 * rng.randn(c)).astype(np.float32)
            sd[f"{prefix}.bias"] = (0.05 * rng.randn(c)).astype(np.float32)
            sd[f"{prefix}.running_mean"] = (
                0.05 * rng.randn(c)).astype(np.float32)
            sd[f"{prefix}.running_var"] = (
                1.0 + 0.05 * np.abs(rng.randn(c))).astype(np.float32)
        else:
            sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.running_var"] = np.abs(
                rng.randn(c)).astype(np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    sd["conv1.weight"] = conv((64, 3, 7, 7))
    bn("bn1", 64)
    in_ch = 64
    for layer, (depth, width) in enumerate(zip(_DEPTHS, _WIDTHS), start=1):
        for b in range(depth):
            p = f"layer{layer}.{b}"
            sd[f"{p}.conv1.weight"] = conv(
                (width, in_ch if b == 0 else width * 4, 1, 1))
            bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = conv((width, width, 3, 3))
            bn(f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = conv((width * 4, width, 1, 1))
            bn(f"{p}.bn3", width * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = conv(
                    (width * 4, in_ch, 1, 1))
                bn(f"{p}.downsample.1", width * 4)
        in_ch = width * 4
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_torchvision_resnet50_import_exact():
    sd = synth_torchvision_resnet50()
    converted = convert_torchvision_resnet50(sd)

    model = ResNet50(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    n_params = len(jax.tree_util.tree_leaves(params))
    tree = {"backbone_net": params}
    new_tree, report = import_flat_weights(tree, converted)

    assert report["unmatched"] == []
    assert report["matched_by_shape"] == []  # everything lands by NAME
    assert report["unused_sources"] == []
    assert len(report["matched_by_name"]) == n_params == len(converted)

    # Every imported leaf equals its converted source array exactly (right
    # placement, right layout) — e.g. the projection kernel came from
    # downsample.0, NOT conv3 (the cross-wiring hazard).
    imported = new_tree["backbone_net"]
    proj = np.asarray(
        imported["ResNetBottleneck_0"]["ConvGN_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        proj, sd["layer1.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    conv3 = np.asarray(
        imported["ResNetBottleneck_0"]["ConvGN_3"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        conv3, sd["layer1.0.conv3.weight"].transpose(2, 3, 1, 0))
    gamma = np.asarray(
        imported["ResNetBottleneck_5"]["ConvGN_1"]["GroupNorm_0"]["gamma"])
    np.testing.assert_array_equal(gamma, sd["layer2.2.bn2.weight"])

    # The imported model runs and produces finite taps.
    taps = model.apply({"params": imported}, jnp.ones((1, 64, 64, 3)),
                       training=False)
    for k in ("C1", "C2", "C3", "C4", "C5"):
        assert np.isfinite(np.asarray(taps[k])).all(), k


def test_torch_layout_conv_equivalence():
    """OIHW→HWIO conversion is numerically faithful: a padding-free conv
    computed by torch.nn.functional.conv2d equals lax.conv with the
    converted kernel."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    w_oihw = rng.randn(8, 5, 1, 1).astype(np.float32)
    x_nchw = rng.randn(2, 5, 6, 6).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x_nchw),
                   torch.from_numpy(w_oihw)).numpy()  # [2,8,6,6]

    w_hwio = convert_torch_layout({"conv.weight": w_oihw})["conv.weight"]
    assert w_hwio.shape == (1, 1, 5, 8)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(w_hwio), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), rtol=1e-5,
                               atol=1e-5)


def test_torch_layout_drops_running_stats_and_transposes_linear():
    converted = convert_torch_layout({
        "bn.running_mean": np.zeros(4), "bn.running_var": np.ones(4),
        "bn.num_batches_tracked": np.asarray(3),
        "fc.weight": np.zeros((10, 20)), "fc.bias": np.zeros(10),
        "dw.weight": np.zeros((16, 1, 3, 3)),  # torch depthwise
    })
    assert set(converted) == {"fc.weight", "fc.bias", "dw.weight"}
    assert converted["fc.weight"].shape == (20, 10)
    assert converted["dw.weight"].shape == (3, 3, 1, 16)


def test_tf_layout_depthwise_reshape():
    converted = convert_tf_layout({
        "block/depthwise_weights": np.zeros((3, 3, 16, 1)),
        "block/BatchNorm/moving_mean": np.zeros(16),
        "block/weights": np.zeros((1, 1, 16, 32)),
    })
    assert set(converted) == {"block/depthwise_weights", "block/weights"}
    assert converted["block/depthwise_weights"].shape == (3, 3, 1, 16)
    assert converted["block/weights"].shape == (1, 1, 16, 32)


def test_load_pretrained_dispatch_and_refusal(tmp_path):
    """``--init-backbone`` entry (utils.pretrained.load_pretrained): a
    torchvision-shaped npz lands on the FULL RetinaNet tree's backbone
    subtree with 0 unmatched; a truncated archive is refused outright."""
    from retinanet_tpu.config import ModelConfig
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.utils.pretrained import load_pretrained

    sd = synth_torchvision_resnet50()
    path = str(tmp_path / "tv_resnet50.npz")
    np.savez(path, **sd)

    model = RetinaNet.from_config(
        ModelConfig(backbone="resnet_50_dense", num_classes=3),
        num_anchors=9, num_classes=3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    new_params, report = load_pretrained(params, path,
                                         backbone="resnet_50_dense")
    assert report["unmatched"] == [] and report["matched_by_shape"] == []
    got = np.asarray(
        new_params["backbone_net"]["ResNetBottleneck_0"]["ConvGN_0"]
        ["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        got, sd["layer1.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    # Head params untouched.
    assert new_params["classification_subnet"] \
        is params["classification_subnet"]

    # Partial archives must raise, not silently half-initialize.
    partial = {k: v for k, v in sd.items() if "layer3" not in k}
    ppath = str(tmp_path / "partial.npz")
    np.savez(ppath, **partial)
    import pytest
    with pytest.raises(ValueError, match="partial init"):
        load_pretrained(params, ppath, backbone="resnet_50_dense")
