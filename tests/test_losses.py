"""Loss tests: reference goldens + masked-vs-boolean-masked equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import LossConfig
from retinanet_tpu.ops import losses


def test_regression_loss_golden():
    # losses_test.py:17-27: huber over [3,1] with fg mask [T,F,T] == 2.0.
    logits = jnp.asarray([[1.0], [2.0], [3.0]])
    labels = jnp.asarray([[3.0], [4.0], [6.0]])
    fg_mask = jnp.asarray([True, False, True])
    out = losses.regression_loss(labels, logits, fg_mask)
    np.testing.assert_allclose(float(out), 2.0, atol=1e-6)


def test_regression_loss_broadcast_divisor():
    # SUM_BY_NONZERO_WEIGHTS counts broadcast weight *elements*: with 4
    # coords and 2 fg anchors the divisor is 8.
    labels = jnp.zeros((3, 4))
    logits = jnp.ones((3, 4)) * 2.0  # |err|=2 -> huber 1.5 each
    fg = jnp.asarray([True, True, False])
    out = losses.regression_loss(labels, logits, fg)
    np.testing.assert_allclose(float(out), (1.5 * 8) / 8, atol=1e-6)


def test_bce_matches_manual():
    rng = np.random.RandomState(0)
    labels = (rng.rand(16, 3) > 0.7).astype(np.float32)
    logits = rng.randn(16, 3).astype(np.float32)
    got = np.asarray(losses.sigmoid_bce_with_logits(
        jnp.asarray(labels), jnp.asarray(logits)))
    p = 1 / (1 + np.exp(-logits))
    want = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_focal_formula():
    labels = jnp.asarray([[1.0, 0.0]])
    logits = jnp.asarray([[0.0, 0.0]])  # prob 0.5 both
    got = np.asarray(losses.focal_sigmoid_bce_with_logits(labels, logits))
    # pos: -0.25 * 0.5**2 * log(0.5); neg: -0.75 * 0.5**2 * log(0.5)
    want_pos = -0.25 * 0.25 * np.log(0.5 + 1e-7)
    want_neg = -0.75 * 0.25 * np.log(0.5 + 1e-7)
    np.testing.assert_allclose(got, [[want_pos, want_neg]], rtol=1e-5)


def _reference_class_loss(labels, logits, mask):
    """Numpy reimplementation of the reference's boolean-mask semantics
    (losses.py:124-139): select trainable anchors, mean BCE + dice(axis=0)."""
    sel_labels = labels[mask]
    sel_logits = logits[mask]
    p = 1 / (1 + np.exp(-sel_logits))
    bce = -(sel_labels * np.log(p) + (1 - sel_labels) * np.log(1 - p))
    inter = (sel_labels * p).sum(axis=0)
    union = sel_labels.sum(axis=0) + p.sum(axis=0)
    dice = 1 - (2 * inter) / union
    return bce.mean() + dice.mean()


def test_classification_loss_matches_boolean_mask_reference():
    rng = np.random.RandomState(1)
    n, c = 64, 5
    labels = (rng.rand(n, c) > 0.8).astype(np.float32)
    logits = rng.randn(n, c).astype(np.float32)
    mask = rng.rand(n) > 0.3
    fg = labels.max(axis=-1) > 0.5

    got = losses.classification_loss(
        jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(mask),
        jnp.asarray(fg & mask), LossConfig())
    want = _reference_class_loss(labels, logits, mask)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_detection_loss_runs_and_is_finite():
    rng = np.random.RandomState(2)
    b, n, c = 2, 32, 3
    class_targets = (rng.rand(b, n, c) > 0.9).astype(np.float32)
    class_logits = rng.randn(b, n, c).astype(np.float32)
    regr_targets = rng.randn(b, n, 4).astype(np.float32)
    regr_logits = rng.randn(b, n, 4).astype(np.float32)
    mask = jnp.asarray(rng.rand(b, n) > 0.2)

    cl, rl = losses.detection_loss(
        jnp.asarray(class_targets), jnp.asarray(class_logits),
        jnp.asarray(regr_targets), jnp.asarray(regr_logits), mask)
    assert np.isfinite(float(cl)) and np.isfinite(float(rl))
    assert float(rl) >= 0 and float(cl) >= 0


def test_detection_loss_no_foreground_is_finite():
    # All background: regression divisor guards against 0/0.
    b, n, c = 1, 16, 3
    cl, rl = losses.detection_loss(
        jnp.zeros((b, n, c)), jnp.zeros((b, n, c)),
        jnp.zeros((b, n, 4)), jnp.zeros((b, n, 4)),
        jnp.ones((b, n), dtype=bool))
    assert np.isfinite(float(cl))
    np.testing.assert_allclose(float(rl), 0.0)


def test_focal_normalized_by_num_fg():
    cfg = LossConfig(class_losses=("focal",))
    n, c = 8, 2
    labels = np.zeros((n, c), np.float32)
    labels[0, 0] = 1
    logits = np.zeros((n, c), np.float32)
    fg = labels.max(-1) > 0.5
    got = losses.classification_loss(
        jnp.asarray(labels), jnp.asarray(logits),
        jnp.ones(n, dtype=bool), jnp.asarray(fg), cfg)
    focal = np.asarray(losses.focal_sigmoid_bce_with_logits(
        jnp.asarray(labels), jnp.asarray(logits)))
    np.testing.assert_allclose(float(got), focal.sum() / 1.0, rtol=1e-5)


def test_all_variants_run():
    rng = np.random.RandomState(3)
    n, c = 32, 4
    labels = (rng.rand(n, c) > 0.8).astype(np.float32)
    logits = rng.randn(n, c).astype(np.float32)
    mask = jnp.ones(n, dtype=bool)
    fg = jnp.asarray(labels.max(-1) > 0.5)
    for name in ("bce", "focal", "dice", "jaccard", "fixed_iou",
                 "balanced_bce"):
        cfg = LossConfig(class_losses=(name,))
        out = losses.classification_loss(
            jnp.asarray(labels), jnp.asarray(logits), mask, fg, cfg)
        assert np.isfinite(float(out)), name


def test_jit_compatible():
    f = jax.jit(lambda a, b, m: losses.detection_loss(
        a, b, jnp.zeros(a.shape[:-1] + (4,)), jnp.zeros(a.shape[:-1] + (4,)),
        m))
    cl, rl = f(jnp.zeros((2, 8, 3)), jnp.zeros((2, 8, 3)),
               jnp.ones((2, 8), dtype=bool))
    assert np.isfinite(float(cl))
