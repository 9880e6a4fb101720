"""Decode + NMS tests: greedy semantics vs numpy reference, classwise
equivalence, Pallas kernel (interpret mode) vs JAX fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import NMSConfig
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.ops.nms import (
    BoxesDecoded, _greedy_keep_mask, classmap_decode, decode_level,
    decode_levels, fused_decode_nms, nms_padded)


def _np_greedy_nms(boxes, scores, threshold):
    """Plain numpy greedy NMS (the reference TF op's documented semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            t = max(boxes[i][0], boxes[j][0])
            l = max(boxes[i][1], boxes[j][1])
            b = min(boxes[i][2], boxes[j][2])
            r = min(boxes[i][3], boxes[j][3])
            inter = max(b - t, 0) * max(r - l, 0)
            area_i = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
            area_j = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / (area_i + area_j - inter) > threshold:
                suppressed[j] = True
    return sorted(keep, key=lambda i: -scores[i])


def test_classmap_decode():
    cm = jnp.asarray([[0.1, 0.9], [0.2, 0.3]])
    np.testing.assert_array_equal(np.asarray(classmap_decode(cm)),
                                  [True, False])


def test_greedy_keep_matches_numpy():
    rng = np.random.RandomState(0)
    n = 64
    centers = rng.rand(n, 2) * 0.8 + 0.1
    sizes = rng.rand(n, 2) * 0.3 + 0.05
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
    scores = rng.rand(n).astype(np.float32)

    order = np.argsort(-scores)
    sorted_boxes = boxes[order].astype(np.float32)
    keep_mask = np.asarray(_greedy_keep_mask(jnp.asarray(sorted_boxes),
                                             jnp.asarray(scores[order]), 0.5))
    got = set(np.nonzero(keep_mask)[0].tolist())
    want = set(range(len(order))) & {
        list(order).index(i) for i in _np_greedy_nms(boxes, scores, 0.5)}
    assert got == want


def test_nms_padded_basic():
    # Three boxes: two heavy overlaps same class, one separate.
    boxes = jnp.asarray([[[0.1, 0.1, 0.5, 0.5],
                          [0.11, 0.11, 0.51, 0.51],
                          [0.6, 0.6, 0.9, 0.9],
                          [0.0, 0.0, 0.0, 0.0]]])
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.0]])
    ids = jnp.asarray([[1, 1, 2, 0]], dtype=jnp.int32)
    valid = jnp.asarray([[True, True, True, False]])
    out = nms_padded(BoxesDecoded(boxes, scores, ids, valid),
                     max_output_size=4)
    v = np.asarray(out.valid[0])
    assert v.sum() == 2
    np.testing.assert_allclose(np.asarray(out.scores[0][v]), [0.9, 0.7])
    np.testing.assert_array_equal(np.asarray(out.class_ids[0][v]), [1, 2])


def test_nms_classwise_keeps_cross_class_overlaps():
    boxes = jnp.asarray([[[0.1, 0.1, 0.5, 0.5],
                          [0.1, 0.1, 0.5, 0.5]]])
    scores = jnp.asarray([[0.9, 0.8]])
    ids = jnp.asarray([[0, 1]], dtype=jnp.int32)
    valid = jnp.ones((1, 2), bool)
    out = nms_padded(BoxesDecoded(boxes, scores, ids, valid))
    assert int(np.asarray(out.valid[0]).sum()) == 2  # different classes kept
    out2 = nms_padded(BoxesDecoded(boxes, scores, ids, valid),
                      classwise=False)
    assert int(np.asarray(out2.valid[0]).sum()) == 1


def test_decode_level_top_k():
    b, h, w, a, c = 1, 4, 4, 2, 3
    rng = np.random.RandomState(0)
    cls = jnp.asarray(rng.randn(b, h, w, a, c).astype(np.float32)) * 3
    regr = jnp.zeros((b, h, w, a, 4))
    anchors = jnp.asarray([[0.25, 0.25], [0.5, 0.5]])
    out = decode_level(cls, regr, anchors, top_k=10, score_threshold=0.5)
    assert out.boxes.shape == (1, 10, 4)
    # Scores sorted descending.
    s = np.asarray(out.scores[0])
    assert np.all(np.diff(s) <= 1e-6)
    # Validity exactly where score > 0.5.
    np.testing.assert_array_equal(np.asarray(out.valid[0]), s > 0.5)


def test_decode_levels_merges():
    levels = build_levels()
    size = 64
    cls = {}
    regr = {}
    for pn in levels:
        g = levels.grid_size(pn, size)
        cls[pn] = jnp.zeros((1, g, g, 9, 3))
        regr[pn] = jnp.zeros((1, g, g, 9, 4))
    cfg = NMSConfig(top_k_per_level=20)
    out = decode_levels(cls, regr, levels, size, cfg)
    # P3/P4/P5 cap at 20; P6/P7 have only 9 anchors each at 64px.
    assert out.boxes.shape == (1, 78, 4)


def test_batched_pallas_kernel_matches_fallback_interpret():
    """Batched kernel (interpret mode) vs per-image JAX fallback."""
    from retinanet_tpu.ops.pallas import nms_kernel as nk
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(7)
    bsz, n = 3, 150
    centers = rng.rand(bsz, n, 2) * 0.8 + 0.1
    sizes = rng.rand(bsz, n, 2) * 0.25 + 0.05
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           -1).astype(np.float32)
    scores = -np.sort(-rng.rand(bsz, n).astype(np.float32), axis=1)

    want = np.stack([
        np.asarray(_greedy_keep_mask(jnp.asarray(boxes[i]),
                                     jnp.asarray(scores[i]), 0.5))
        for i in range(bsz)])

    num_tiles = -(-n // nk.TILE)
    padded = num_tiles * nk.TILE
    pad = np.full((bsz, padded - n, 4), -1e6, np.float32)
    pad += np.arange(padded - n, dtype=np.float32)[None, :, None] * 8.0
    all_boxes = np.concatenate([boxes, pad], 1)
    coords = [jnp.asarray(all_boxes[:, :, i].reshape(bsz, num_tiles, nk.TILE)
                          .transpose(1, 0, 2)) for i in range(4)]
    keep = pl.pallas_call(
        functools.partial(nk._nms_kernel_batch, iou_threshold=0.5,
                          num_tiles=num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, bsz, nk.TILE),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((bsz, nk.TILE, nk.TILE), jnp.float32)],
        interpret=True,
    )(*coords)
    got = np.asarray(keep).transpose(1, 0, 2).reshape(bsz, padded)[:, :n] > 0
    np.testing.assert_array_equal(got, want)


def test_pre_nms_top_k():
    n = 8
    boxes = np.zeros((1, n, 4), np.float32)
    boxes[0, :, 2:] = 0.1  # small identical boxes at origin... make distinct
    for i in range(n):
        boxes[0, i] = [i * 0.1, 0.0, i * 0.1 + 0.05, 0.05]
    scores = np.linspace(0.9, 0.6, n, dtype=np.float32)[None]
    ids = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    out = nms_padded(BoxesDecoded(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(ids), jnp.asarray(valid)),
                     max_output_size=8, pre_nms_top_k=4)
    # Only the top-4 candidates could survive.
    assert int(np.asarray(out.valid).sum()) == 4


def test_pallas_kernel_matches_fallback_interpret():
    """Run the Pallas NMS kernel in interpreter mode on CPU and compare
    against the pure-JAX greedy fallback."""
    from retinanet_tpu.ops.pallas import nms_kernel as nk
    import functools
    from jax.experimental import pallas as pl

    rng = np.random.RandomState(1)
    n = 200  # not a multiple of 128 → exercises padding
    centers = rng.rand(n, 2) * 0.8 + 0.1
    sizes = rng.rand(n, 2) * 0.25 + 0.05
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
    scores = -np.sort(-rng.rand(n).astype(np.float32))  # already sorted
    boxes = boxes.astype(np.float32)

    want = np.asarray(_greedy_keep_mask(jnp.asarray(boxes),
                                        jnp.asarray(scores), 0.5))

    # Interpret-mode pallas_call (CPU-safe).
    num_tiles = -(-n // nk.TILE)
    padded = num_tiles * nk.TILE
    pad = np.full((padded - n, 4), -1e6, np.float32)
    pad += np.arange(padded - n, dtype=np.float32)[:, None] * 8.0
    all_boxes = np.concatenate([boxes, pad], 0)
    coords = [jnp.asarray(all_boxes[:, i].reshape(num_tiles, nk.TILE))
              for i in range(4)]
    from jax.experimental.pallas import tpu as pltpu
    keep = pl.pallas_call(
        functools.partial(nk._nms_kernel, iou_threshold=0.5,
                          num_tiles=num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, nk.TILE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nk.TILE, nk.TILE), jnp.float32)],
        interpret=True,
    )(*coords)
    got = np.asarray(keep.reshape(-1)[:n] > 0)
    np.testing.assert_array_equal(got, want)


def test_decode_level_packed_bf16_matches_reference():
    """The bf16 packed-key decode path (single fused max producing score +
    class) is bit-exact against a numpy reference with argmax-lowest-index
    tie semantics, including crafted exact-tie rows."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    b, h, w, a, c = 2, 4, 4, 2, 7
    n = h * w * a
    logits = rng.randn(b, h, w, a, c).astype(np.float32)
    # Exact ties within a position (argmax must pick the LOWEST class) and
    # across positions.
    logits[0, 0, 0, 0, :] = 1.25       # all classes tied
    logits[0, 1, 1, 0, 2:5] = 2.5      # classes 2,3,4 tied at the max
    logits[1, 2, 2, 1, :] = -0.75
    bf = jnp.asarray(logits, jnp.bfloat16)
    regr = jnp.asarray(rng.randn(b, h, w, a, 4).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    anchor_sizes = jnp.asarray([[0.2, 0.2], [0.3, 0.15]], jnp.float32)

    from retinanet_tpu.ops.nms import decode_level
    out = decode_level(bf, regr, anchor_sizes, top_k=n,
                       score_threshold=0.0)  # k = n: every anchor selected

    # Numpy reference on the f32 view of the SAME bf16 values.
    f32 = np.asarray(bf, np.float32).reshape(b, n, c)
    best = f32.max(-1)
    ids_ref = f32.argmax(-1)  # lowest index on ties
    scores_ref = 1.0 / (1.0 + np.exp(-best))

    # Compare per anchor position (order-independent via top_idx-free
    # full-selection: sort both by flat anchor index reconstructed from
    # the decoded ids/scores pairing).
    got_scores = np.asarray(out.scores)
    got_ids = np.asarray(out.class_ids)
    for i in range(b):
        # Packed top_k orders by (logit desc, class asc, position asc):
        # cross-position ties re-order by class rank — the documented
        # (measure-zero) deviation vs plain stable-by-position.
        order = np.lexsort((np.arange(n), ids_ref[i], -best[i]))
        np.testing.assert_allclose(got_scores[i], scores_ref[i][order],
                                   rtol=0, atol=1e-6)  # f32 vs f64 sigmoid
        np.testing.assert_array_equal(got_ids[i], ids_ref[i][order])


def test_fused_decode_nms_matches_reference_path():
    """fused_decode_nms (serving hot path: box work deferred past the
    pre-NMS selection) is equivalent to decode_levels + nms_padded on
    random logits, in f32 and bf16, including pre-NMS truncation."""
    from retinanet_tpu.ops.nms import fused_decode_nms

    levels = build_levels()
    size = 128
    rng = np.random.RandomState(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        cls, regr = {}, {}
        for pn in levels:
            g = levels.grid_size(pn, size)
            cls[pn] = jnp.asarray(
                rng.randn(2, g, g, 9, 5).astype(np.float32) * 2, dtype)
            regr[pn] = jnp.asarray(
                rng.randn(2, g, g, 9, 4).astype(np.float32) * 0.1, dtype)
        cfg = NMSConfig(top_k_per_level=50, pre_nms_top_k=60,
                        max_output_size=40, score_threshold=0.3,
                        use_pallas=False)
        ref = nms_padded(decode_levels(cls, regr, levels, size, cfg),
                         iou_threshold=cfg.iou_threshold,
                         max_output_size=cfg.max_output_size,
                         classwise=True, use_pallas=False,
                         pre_nms_top_k=cfg.pre_nms_top_k)
        got = fused_decode_nms(cls, regr, levels, size, cfg,
                               use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
        np.testing.assert_array_equal(np.asarray(got.class_ids),
                                      np.asarray(ref.class_ids))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), atol=1e-6)
        v = np.asarray(ref.valid)
        np.testing.assert_allclose(np.asarray(got.boxes)[v],
                                   np.asarray(ref.boxes)[v], atol=1e-5)


def test_jacobi_suppression_matches_sequential():
    """The fixed-point suppression must be bit-identical to the sequential
    greedy loop — including adversarial linear suppression chains (each box
    overlaps its neighbour, so keep[i] depends on keep[i-1] all the way
    down) and randomized clustered boxes."""
    rng = np.random.RandomState(7)

    # Adversarial chain: 1x1 boxes stepped by 0.3 => neighbour IoU 0.54
    # (> 0.5), next-neighbour IoU 0.25 (< 0.5) -> greedy keeps evens.
    n = 64
    t = np.arange(n, dtype=np.float32) * 0.3
    chain = np.stack([np.zeros(n), t, np.ones(n), t + 1.0], -1)
    cases = [chain[None]]

    # Clustered random boxes (many overlaps), few classes.
    for b, n_r in ((3, 50), (2, 128)):
        centers = rng.rand(b, n_r, 2) * 0.4 + 0.3
        sizes = rng.rand(b, n_r, 2) * 0.3 + 0.05
        tl = centers - sizes / 2
        br = centers + sizes / 2
        cases.append(np.concatenate([tl, br], -1).astype(np.float32))

    for boxes in cases:
        b, n_c = boxes.shape[:2]
        scores = rng.rand(b, n_c).astype(np.float32) * 0.5 + 0.5
        ids = rng.randint(0, 3, (b, n_c)).astype(np.int32)
        valid = rng.rand(b, n_c) > 0.1
        dec = BoxesDecoded(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(ids), jnp.asarray(valid))
        seq = nms_padded(dec, suppression="sequential")
        jac = nms_padded(dec, suppression="jacobi")
        for a, c in zip(seq, jac):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fused_decode_nms_approx_global_smoke():
    """use_approx_global_top_k must produce a valid, score-sorted detection
    set (on CPU approx_max_k lowers to an exact sort, so it should match
    the exact path; assert the weaker always-true contract plus equality
    of the surviving detection count)."""
    from retinanet_tpu.config import AnchorConfig
    from retinanet_tpu.ops.anchors import build_levels
    levels = build_levels(AnchorConfig())
    size = 64
    rng = np.random.RandomState(11)
    cls, regr = {}, {}
    for pn in levels:
        g = levels.grid_size(pn, size)
        cls[pn] = jnp.asarray(rng.randn(2, g, g, 9, 5) * 2, jnp.float32)
        regr[pn] = jnp.asarray(rng.randn(2, g, g, 9, 4) * 0.1, jnp.float32)
    kw = dict(top_k_per_level=50, pre_nms_top_k=60, max_output_size=40,
              score_threshold=0.3, use_pallas=False)
    exact = fused_decode_nms(cls, regr, levels, size, NMSConfig(**kw))
    approx = fused_decode_nms(cls, regr, levels, size,
                              NMSConfig(use_approx_global_top_k=True, **kw))
    for out in (approx,):
        s = np.asarray(out.scores)
        v = np.asarray(out.valid)
        assert (np.diff(s, axis=1) <= 1e-6).all()  # descending
        assert v.sum() > 0
    assert np.asarray(approx.valid).sum() == np.asarray(exact.valid).sum()
