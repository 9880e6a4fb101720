"""Shape-contract tests for backbones, FPN, heads, and the full detector
(reference style: ``resnet_test.py``, ``densenet_test.py``,
``retinanet_test.py`` — run on zeros, assert C/P-level shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.models.densenet import DenseNetBC121
from retinanet_tpu.models.fpn import FPN
from retinanet_tpu.models.heads import ClassificationSubnet, RegressionSubnet
from retinanet_tpu.models.mobilenet_v2 import MobileNetV2
from retinanet_tpu.models.resnet import ResNet50, ResNeXt50
from retinanet_tpu.models.retinanet import RetinaNet, l2_regularization

F32 = jnp.float32


def _init_apply(module, x, training=False):
    variables = module.init(jax.random.PRNGKey(0), x, training=False)
    rngs = {"dropout": jax.random.PRNGKey(1)} if training else {}
    out = module.apply(variables, x, training=training, rngs=rngs)
    return variables, out


@pytest.mark.parametrize("cls,kwargs", [
    (MobileNetV2, dict(activation="elu", dropout_rate=0.2)),
    (ResNeXt50, dict(activation="elu")),
    (ResNet50, dict(activation="elu")),
    (DenseNetBC121, dict(activation="elu", dropout_rate=0.2)),
])
def test_backbone_level_strides(cls, kwargs):
    size = 64
    net = cls(**kwargs, dtype=F32) if cls is not DenseNetBC121 \
        else DenseNetBC121(**kwargs, dtype=F32)
    x = jnp.zeros((1, size, size, 3), F32)
    _, out = _init_apply(net, x)
    assert set(out.keys()) == {"C1", "C2", "C3", "C4", "C5"}
    for k, v in out.items():
        stride = 2 ** int(k[1])
        assert v.shape[1] == v.shape[2] == size // stride, (k, v.shape)


def test_fpn_levels():
    size = 128  # P7 stride is 128; smaller sizes collapse to 1×1
    c = {
        "C3": jnp.zeros((1, size // 8, size // 8, 24), F32),
        "C4": jnp.zeros((1, size // 16, size // 16, 96), F32),
        "C5": jnp.zeros((1, size // 32, size // 32, 32), F32),
    }
    fpn = FPN(channels=256, activation="elu", dtype=F32)
    variables = fpn.init(jax.random.PRNGKey(0), c, training=False)
    out = fpn.apply(variables, c, training=False)
    assert set(out.keys()) == {"P3", "P4", "P5", "P6", "P7"}
    for k, v in out.items():
        stride = 2 ** int(k[1])
        assert v.shape == (1, size // stride, size // stride, 256), k


def test_classification_head_shape_and_prior():
    head = ClassificationSubnet(num_anchors=9, num_classes=5, dtype=F32)
    x = jnp.zeros((2, 8, 8, 256), F32)
    _, out = _init_apply(head, x)
    assert out.shape == (2, 8, 8, 9, 5)
    assert out.dtype == jnp.float32
    # π=0.01 prior: sigmoid of initial logits ≈ 0.01 on zero input.
    probs = jax.nn.sigmoid(np.asarray(out))
    np.testing.assert_allclose(probs.mean(), 0.01, atol=2e-3)


def test_regression_head_shape():
    head = RegressionSubnet(num_anchors=9, dtype=F32)
    x = jnp.zeros((2, 8, 8, 256), F32)
    _, out = _init_apply(head, x)
    assert out.shape == (2, 8, 8, 9, 4)


@pytest.mark.parametrize("backbone", ["mobilenet_v2", "resnet_50"])
def test_retinanet_full(backbone):
    size = 64
    net = RetinaNet(backbone=backbone, num_classes=3, num_anchors=9,
                    dropout_rate=0.0, dtype=F32)
    x = jnp.zeros((1, size, size, 3), F32)
    variables, out = _init_apply(net, x)
    assert set(out.keys()) == {"classifications", "regressions"}
    for k in ("P3", "P4", "P5", "P6", "P7"):
        g = max(1, size // 2 ** int(k[1]))  # stride-2 convs floor at 1×1
        assert out["classifications"][k].shape == (1, g, g, 9, 3)
        assert out["regressions"][k].shape == (1, g, g, 9, 4)

    # Heads are shared: exactly one classification_subnet param subtree.
    top = variables["params"].keys()
    assert sum(1 for k in top if "classification_subnet" in k) == 1

    # L2 regularization over kernels is finite and positive.
    reg = l2_regularization(variables["params"], backbone)
    assert float(reg) > 0 and np.isfinite(float(reg))


def test_retinanet_dropout_training_mode():
    net = RetinaNet(backbone="mobilenet_v2", num_classes=2,
                    dropout_rate=0.5, dtype=F32)
    x = jnp.ones((1, 64, 64, 3), F32)
    variables = net.init(jax.random.PRNGKey(0), x, training=False)
    out1 = net.apply(variables, x, training=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = net.apply(variables, x, training=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # Different dropout rngs → different logits.
    diff = np.abs(np.asarray(out1["classifications"]["P3"])
                  - np.asarray(out2["classifications"]["P3"])).max()
    assert diff > 0


def test_groupnorm_matches_reference_math():
    from retinanet_tpu.models.layers import GroupNorm
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 64).astype(np.float32)
    gn = GroupNorm(groups=32, eps=1e-5, dtype=F32)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(gn.apply(variables, jnp.asarray(x)))

    # Reference math (normalization.py:20-33): reshape to groups, moments
    # over (H, W, C/G).
    g = 32
    xr = x.reshape(2, 4, 4, g, 64 // g)
    mean = xr.mean(axis=(1, 2, 4), keepdims=True)
    var = xr.var(axis=(1, 2, 4), keepdims=True)
    want = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_groupnorm_caps_groups_at_channels():
    from retinanet_tpu.models.layers import GroupNorm
    x = jnp.ones((1, 2, 2, 8))
    gn = GroupNorm(groups=32, dtype=F32)  # capped to 8 groups
    variables = gn.init(jax.random.PRNGKey(0), x)
    out = gn.apply(variables, x)
    assert out.shape == x.shape


def test_int8_quantized_matches_float_closely():
    """quantize='int8' keeps the float model's param tree and approximates
    its outputs (dynamic per-tensor activation + per-channel weight quant).
    Uses the same params for both models: the quantized model is a serving
    transform, not a retrain."""
    import dataclasses
    from retinanet_tpu.config import ModelConfig

    cfg = ModelConfig(backbone="mobilenet_v2", num_classes=3,
                      dropout_rate=0.0, compute_dtype="float32")
    cfg_q = dataclasses.replace(cfg, quantize="int8")
    mf = RetinaNet.from_config(cfg, num_anchors=9)
    mq = RetinaNet.from_config(cfg_q, num_anchors=9)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), F32)
    params = mf.init(jax.random.PRNGKey(0), x, training=False)["params"]
    params_q = mq.init(jax.random.PRNGKey(0), x, training=False)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)

    of = mf.apply({"params": params}, x, training=False)
    oq = mq.apply({"params": params}, x, training=False)
    for k in of["classifications"]:
        a = np.asarray(of["classifications"][k])
        b = np.asarray(oq["classifications"][k])
        # Logits stay in the same regime — loose bound; exact parity is a
        # per-layer property (quantization error compounds through depth).
        assert np.abs(a - b).max() < 1.0, k
        assert np.isfinite(b).all()


def test_grouped_as_dense_matches_grouped():
    """Block-diagonal dense conv == grouped conv exactly (same params)."""
    from retinanet_tpu.models.layers import Conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), F32)
    grouped = Conv(features=64, kernel_size=3, feature_group_count=8,
                   dtype=F32)
    dense = Conv(features=64, kernel_size=3, feature_group_count=8,
                 grouped_as_dense=True, dtype=F32)
    params = grouped.init(jax.random.PRNGKey(0), x)
    y_g = grouped.apply(params, x)
    y_d = dense.apply(params, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_g),
                               atol=1e-5, rtol=1e-5)

    # Gradients agree too (off-block weight grads are masked to zero in the
    # dense path, matching the grouped parameterization).
    def loss(m):
        def f(p):
            return jnp.sum(jnp.square(m.apply(p, x)))
        return jax.grad(f)(params)
    g_g = jax.tree_util.tree_leaves(loss(grouped))
    g_d = jax.tree_util.tree_leaves(loss(dense))
    for a, b in zip(g_g, g_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)
