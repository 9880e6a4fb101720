"""Round-3 TPU profiling harness (VERDICT r2 #1: profile-driven bf16 push).

Produces the per-stage cost table the judge asked for: cumulative-prefix
timings of the REAL jitted flagship program (XLA DCEs everything past the
reduced tap, so each prefix compiles with full fusion context), plus
compiled-program cost_analysis, a jax.profiler trace attempt, and in-model
A/B runs of candidate optimizations (approx top-k decode, space-to-depth
stem probe, latency-mode NMS caps).

Run ONE subcommand per process (one TPU process at a time; tunnel rules):
    timeout 1800 python _profile_r3.py stages [batch] [size]
    timeout 1800 python _profile_r3.py cost
    timeout 1800 python _profile_r3.py trace
    timeout 1800 python _profile_r3.py approx
    timeout 1800 python _profile_r3.py s2d
    timeout 1800 python _profile_r3.py latency
"""
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12   # FLOP/s
V5E_HBM_BW = 819e9       # B/s


@jax.jit
def _scalar(x):
    return jnp.sum(x.astype(jnp.float32))


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(_scalar(leaf))


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def _flagship(batch, size, **nms_overrides):
    from retinanet_tpu.config import Config
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.ops.anchors import build_levels

    config = Config()
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, backbone="resnet_50_dense"),
        nms=dataclasses.replace(config.nms, **nms_overrides))
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model, levels.num_anchors, 80)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    images = jax.random.normal(rng, (batch, size, size, 3), jnp.float32)
    return config, levels, model, params, images


def _cost(jitted, *args):
    """(flops, bytes) from the compiled program's cost analysis."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", float("nan"))), \
            float(c.get("bytes accessed", float("nan")))
    except Exception as e:  # noqa
        print(f"  cost_analysis failed: {type(e).__name__}: {e}")
        return float("nan"), float("nan")


def stages(batch=128, size=640):
    """Cumulative-prefix table: time/flops/bytes per added stage."""
    from retinanet_tpu.infer import make_inference_fn

    config, levels, model, params, images = _flagship(batch, size)

    def tap_fn(names):
        def m_fn(m, x, training):
            taps = m.backbone_net(x.astype(m.dtype), training=training)
            return [jnp.sum(taps[k].astype(jnp.float32)) for k in names]
        return jax.jit(lambda p, x: model.apply(
            {"params": p}, x, training=False, method=m_fn))

    def fpn_fn():
        def m_fn(m, x, training):
            taps = m.backbone_net(x.astype(m.dtype), training=training)
            td = m.fpn({k: taps[k] for k in ("C3", "C4", "C5")},
                       training=training)
            return [jnp.sum(v.astype(jnp.float32)) for v in td.values()]
        return jax.jit(lambda p, x: model.apply(
            {"params": p}, x, training=False, method=m_fn))

    def heads_fn(which):
        def m_fn(m, x, training):
            taps = m.backbone_net(x.astype(m.dtype), training=training)
            td = m.fpn({k: taps[k] for k in ("C3", "C4", "C5")},
                       training=training)
            outs = []
            for k, v in td.items():
                if which in ("cls", "both"):
                    outs.append(jnp.sum(
                        m.classification_subnet(v, training=training)
                        .astype(jnp.float32)))
                if which in ("regr", "both"):
                    outs.append(jnp.sum(
                        m.regression_subnet(v, training=training)
                        .astype(jnp.float32)))
            return outs
        return jax.jit(lambda p, x: model.apply(
            {"params": p}, x, training=False, method=m_fn))

    rows = []

    def row(name, jitted):
        t = timeit(jitted, params, images)
        fl, by = _cost(jitted, params, images)
        rows.append((name, t, fl, by))
        print(f"{name:28s} {t*1e3:8.2f} ms  "
              f"{fl/1e9/batch if fl == fl else float('nan'):7.1f} GF/img  "
              f"{by/1e9:7.2f} GB  "
              f"mfu={fl/t/V5E_BF16_PEAK*100 if fl == fl else float('nan'):5.1f}%  "
              f"hbm={by/t/V5E_HBM_BW*100 if by == by else float('nan'):5.1f}%",
              flush=True)

    row("stem (C1)", tap_fn(["C1"]))
    row("+res2 (C2)", tap_fn(["C2"]))
    row("+res3 (C3)", tap_fn(["C3"]))
    row("+res4 (C4)", tap_fn(["C4"]))
    row("+res5 (C2..C5)", tap_fn(["C2", "C3", "C4", "C5"]))
    row("+fpn", fpn_fn())
    row("+heads(cls)", heads_fn("cls"))
    row("+heads(both)", heads_fn("both"))

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    row("forward(full)", fwd)

    from retinanet_tpu.ops.nms import decode_levels
    nms_cfg = config.nms

    def dec_fn(p, x):
        out = model.apply({"params": p}, x, training=False)
        d = decode_levels(out["classifications"], out["regressions"],
                          levels, x.shape[1:3], nms_cfg)
        return d.scores
    row("+decode", jax.jit(dec_fn))

    full = make_inference_fn(model, levels, config)
    row("+nms (full pipeline)", full)

    print("\nDeltas (stage cost = row minus previous):")
    prev = 0.0
    for name, t, fl, by in rows:
        print(f"  {name:28s} Δ {max(t - prev, 0)*1e3:7.2f} ms")
        prev = t
    print(json.dumps({"rows": [
        {"name": n, "ms": t * 1e3, "flops": fl, "bytes": by}
        for n, t, fl, by in rows]}))


def _train_inputs(batch, size, max_boxes):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    boxes[:, 1] = [0.5, 0.4, 0.9, 0.8]
    mask = np.zeros((batch, max_boxes), bool)
    mask[:, :2] = True
    return images, (jnp.asarray(boxes),
                    jnp.zeros((batch, max_boxes), jnp.int32),
                    jnp.asarray(mask), jax.random.PRNGKey(1))


def trainprof(batch=16, size=640):
    """Train-step decomposition (the train path was never profiled):
    assignment, forward+loss, value_and_grad, full step, metrics variant.
    Same cumulative-prefix idea as `stages`, but through the grad."""
    from retinanet_tpu import train as T
    from retinanet_tpu.ops import assign
    from retinanet_tpu.ops.losses import detection_loss
    from retinanet_tpu.ops.preprocess import maybe_normalize
    from retinanet_tpu.utils.pytree import flatten_levels

    config, levels, model, _, _ = _flagship(batch, size)
    images, (boxes, ids, mask, rng) = _train_inputs(
        batch, size, config.assign.max_boxes)
    num_classes = 80

    def labels(imgs):
        cls_t, regr_t, masks = assign.build_labels_batch(
            boxes, ids, mask, imgs.shape[1:3], levels, num_classes,
            config.assign)
        return (flatten_levels(cls_t), flatten_levels(regr_t),
                flatten_levels(masks))

    def loss_fn(params, imgs, ct, rt, tm):
        out = model.apply({"params": params}, imgs, training=True,
                          rngs={"dropout": rng})
        cl = flatten_levels(out["classifications"])
        rg = flatten_levels(out["regressions"])
        class_loss, regr_loss = detection_loss(ct, cl, rt, rg, tm,
                                               config.loss)
        reg = T.l2_regularization(params, model.backbone,
                                  config.loss.weight_decay)
        return class_loss + regr_loss + reg

    def assign_only(p, imgs):
        ct, rt, tm = labels(maybe_normalize(imgs, config.data))
        return jnp.sum(ct) + jnp.sum(rt) + jnp.sum(tm)

    def fwd_loss(p, imgs):
        imgs = maybe_normalize(imgs, config.data)
        ct, rt, tm = labels(imgs)
        return loss_fn(p, imgs, ct, rt, tm)

    def grad_fn(p, imgs):
        imgs = maybe_normalize(imgs, config.data)
        ct, rt, tm = labels(imgs)
        total, grads = jax.value_and_grad(loss_fn)(p, imgs, ct, rt, tm)
        import optax
        return total + optax.global_norm(grads)

    state = T.create_train_state(model, config, jax.random.PRNGKey(0))
    params = state.params

    rows = []

    def row(name, jitted, *args):
        t = timeit(jitted, *args)
        fl, by = _cost(jitted, *args)
        rows.append((name, t, fl, by))
        print(f"{name:26s} {t*1e3:8.2f} ms  "
              f"{fl/1e9/batch if fl == fl else float('nan'):7.1f} GF/img  "
              f"{by/1e9:7.2f} GB  "
              f"mfu={fl/t/V5E_BF16_PEAK*100 if fl == fl else 0:5.1f}%  "
              f"hbm={by/t/V5E_HBM_BW*100 if by == by else 0:5.1f}%",
              flush=True)

    row("assignment only", jax.jit(assign_only), params, images)
    row("+forward+loss", jax.jit(fwd_loss), params, images)
    row("+grad (bwd)", jax.jit(grad_fn), params, images)

    def step_row(name, with_metrics):
        st = T.create_train_state(model, config, jax.random.PRNGKey(0))
        step = jax.jit(T.make_train_step(model, levels, config,
                                         with_metrics=with_metrics),
                       donate_argnums=(0,))
        fl, by = _cost(step, st, images, boxes, ids, mask, rng)
        m = None
        for _ in range(2):
            st, m = step(st, images, boxes, ids, mask, rng)
        jax.device_get(m["total_loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            st, m = step(st, images, boxes, ids, mask, rng)
        jax.device_get(m["total_loss"])
        t = (time.perf_counter() - t0) / iters
        rows.append((name, t, fl, by))
        print(f"{name:26s} {t*1e3:8.2f} ms  "
              f"{fl/1e9/batch:7.1f} GF/img  {by/1e9:7.2f} GB  "
              f"mfu={fl/t/V5E_BF16_PEAK*100:5.1f}%  "
              f"hbm={by/t/V5E_HBM_BW*100:5.1f}%  "
              f"({batch/t:.1f} img/s)", flush=True)

    step_row("full step (hot variant)", False)
    step_row("full step (+metrics)", True)

    print("\nDeltas:")
    prev = 0.0
    for name, t, fl, by in rows[:3]:
        print(f"  {name:26s} Δ {max(t - prev, 0)*1e3:7.2f} ms")
        prev = t
    print(json.dumps({"rows": [
        {"name": n, "ms": t * 1e3, "flops": fl, "bytes": by}
        for n, t, fl, by in rows]}))


def assignsweep(batch=16, size=640):
    """Assignment-only time vs AssignConfig.match_chunk (0 = dense)."""
    from retinanet_tpu.ops import assign
    from retinanet_tpu.utils.pytree import flatten_levels

    config, levels, _, _, _ = _flagship(batch, size)
    _, (boxes, ids, mask, _) = _train_inputs(batch, size,
                                             config.assign.max_boxes)
    for chunk in (0, 5, 10, 20, 25, 50, 100):
        cfg = dataclasses.replace(config.assign, match_chunk=chunk)

        def fn(b, i, m, cfg=cfg):
            ct, rt, tm = assign.build_labels_batch(
                b, i, m, (size, size), levels, 80, cfg)
            return (jnp.sum(flatten_levels(ct)) + jnp.sum(flatten_levels(rt))
                    + jnp.sum(flatten_levels(tm).astype(jnp.float32)))

        t = timeit(jax.jit(fn), boxes, ids, mask)
        print(f"chunk {chunk:3d}: {t*1e3:7.2f} ms", flush=True)


def assignprof(batch=16, size=640):
    """Cumulative component taps inside label assignment: match reduction,
    class gather+one-hot, regression gather+encode."""
    from retinanet_tpu.ops import assign
    from retinanet_tpu.ops import boxes as box_ops
    from retinanet_tpu.utils.pytree import flatten_levels

    config, levels, _, _, _ = _flagship(batch, size)
    _, (boxes, ids, mask, _) = _train_inputs(batch, size,
                                             config.assign.max_boxes)
    cfg = config.assign

    def per_level(tap):
        def one_image(b, i, m):
            outs = []
            for pn in levels:
                gh, gw = levels.grid_hw(pn, (size, size))
                a_sizes = jnp.asarray(
                    levels.normalized_anchor_sizes(pn, (size, size)))
                grid = box_ops.position_grid(gh, gw)[:, :, None, :]
                a_pos = jnp.broadcast_to(grid, (gh, gw, len(a_sizes), 2))
                a_size = jnp.broadcast_to(
                    a_sizes[None, None].astype(jnp.float32),
                    (gh, gw, len(a_sizes), 2))
                a_corner = box_ops.from_center_box(
                    jnp.concatenate([a_pos, a_size], axis=-1))
                outs.append(tap(b, i, m, a_corner, a_pos, a_size))
            return outs
        return jax.jit(jax.vmap(one_image))

    def t_match(b, i, m, a_corner, a_pos, a_size):
        miou, midx = assign._match(a_corner, b, m, cfg.match_chunk)
        return jnp.sum(miou) + jnp.sum(midx)

    def t_class(b, i, m, a_corner, a_pos, a_size):
        miou, midx = assign._match(a_corner, b, m, cfg.match_chunk)
        matched_class = jnp.take(i, midx, axis=0)
        cls = jax.nn.one_hot(matched_class, 80, dtype=jnp.float32)
        cls = jnp.where((miou < cfg.pos_iou_threshold)[..., None], 0.0, cls)
        return jnp.sum(cls)

    def t_regr(b, i, m, a_corner, a_pos, a_size):
        miou, midx = assign._match(a_corner, b, m, cfg.match_chunk)
        center = box_ops.to_center_box(b)
        mbox = jnp.take(center, midx, axis=0)
        mpos, msize = jnp.split(mbox, 2, axis=-1)
        shifts = (mpos - a_pos) / a_size
        regr = jnp.concatenate(
            [shifts, jnp.log(jnp.maximum(msize, 1e-8) / a_size)], axis=-1)
        return jnp.sum(regr)

    for name, tap in [("match only", t_match), ("match+class", t_class),
                      ("match+regr", t_regr)]:
        t = timeit(per_level(tap), boxes, ids, mask)
        print(f"{name:14s} {t*1e3:7.2f} ms", flush=True)

    def full(b, i, m):
        ct, rt, tm = assign.build_labels_batch(
            b, i, m, (size, size), levels, 80, cfg)
        return (jnp.sum(flatten_levels(ct)) + jnp.sum(flatten_levels(rt))
                + jnp.sum(flatten_levels(tm).astype(jnp.float32)))
    t = timeit(jax.jit(full), boxes, ids, mask)
    print(f"{'full':14s} {t*1e3:7.2f} ms", flush=True)

    # On-TPU exactness: one-hot-matmul selection (the shipped path) vs the
    # gather formulation, bitwise, on random boxes (64px canvas keeps the
    # comparison cheap; selection exactness is size-independent).
    rng = np.random.RandomState(3)
    n = 100
    tl = rng.rand(n, 2).astype(np.float32) * 0.6
    b2 = jnp.asarray(np.concatenate([tl, tl + rng.rand(n, 2) * 0.4 + 0.01],
                                    -1), jnp.float32)[None]
    i2 = jnp.asarray(rng.randint(0, 80, n), jnp.int32)[None]
    m2 = jnp.asarray(rng.rand(n) < 0.8)[None]

    def gather_labels(b, i, m):
        from retinanet_tpu.ops import boxes as bo
        outs = {}
        for pn in levels:
            gh, gw = levels.grid_hw(pn, (64, 64))
            a_sizes = jnp.asarray(
                levels.normalized_anchor_sizes(pn, (64, 64)))
            grid = bo.position_grid(gh, gw)[:, :, None, :]
            a_pos = jnp.broadcast_to(grid, (gh, gw, len(a_sizes), 2))
            a_size = jnp.broadcast_to(
                a_sizes[None, None].astype(jnp.float32),
                (gh, gw, len(a_sizes), 2))
            a_corner = bo.from_center_box(
                jnp.concatenate([a_pos, a_size], axis=-1))
            miou, midx = assign._match(a_corner, b, m, 0)
            mc = jnp.take(i, midx, axis=0)
            cls = jax.nn.one_hot(mc, 80, dtype=jnp.float32)
            bg = miou < (cfg.pos_iou_threshold if cfg.bg_uses_pos_threshold
                         else cfg.neg_iou_threshold)
            cls = jnp.where(bg[..., None], 0.0, cls)
            mbox = jnp.take(bo.to_center_box(b), midx, axis=0)
            mpos, msize = jnp.split(mbox, 2, axis=-1)
            regr = jnp.concatenate(
                [(mpos - a_pos) / a_size,
                 jnp.log(jnp.maximum(msize, 1e-8) / a_size)], axis=-1)
            outs[pn] = (cls, regr)
        return outs

    ship = jax.jit(lambda b, i, m: assign.build_labels_batch(
        b, i, m, (64, 64), levels, 80, cfg))(b2, i2, m2)
    ref = jax.jit(jax.vmap(gather_labels))(b2[:], i2, m2)
    bad = 0
    for pn, (cls_r, regr_r) in ref.items():
        for name, a, b_ in (("cls", ship[0][pn], cls_r),
                            ("regr", ship[1][pn], regr_r)):
            diff = int(jnp.sum(jnp.asarray(a) != jnp.asarray(b_)))
            if diff:
                mx = float(jnp.max(jnp.abs(jnp.asarray(a)
                                           - jnp.asarray(b_))))
                print(f"  exactness {pn}/{name}: {diff} mismatches "
                      f"max|Δ|={mx:.3e}", flush=True)
                bad += diff
    print("exactness: BITWISE EQUAL" if bad == 0
          else f"exactness: {bad} mismatching elements", flush=True)


def trainsweep(size=640):
    """Train-step throughput vs batch size (and remat at the largest)."""
    from retinanet_tpu import train as T
    from retinanet_tpu.config import Config

    config, *_ = _flagship(1, size)
    for b in (8, 16, 32, 48, 64):
        try:
            r = T.benchmark_train(config, batch_size=b, steps=6, warmup=2)
            print(f"b{b:<3d} {r['images_per_sec']:7.1f} img/s  "
                  f"{r['step_ms']:7.1f} ms/step", flush=True)
        except Exception as e:
            print(f"b{b:<3d} failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            break
    cfg_remat = dataclasses.replace(
        config, model=dataclasses.replace(config.model, remat=True))
    for b in (32, 64, 96):
        try:
            r = T.benchmark_train(cfg_remat, batch_size=b, steps=6, warmup=2)
            print(f"remat b{b:<3d} {r['images_per_sec']:7.1f} img/s  "
                  f"{r['step_ms']:7.1f} ms/step", flush=True)
        except Exception as e:
            print(f"remat b{b:<3d} failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            break


def infersweep(size=640):
    """End-to-end inference throughput vs batch size, serving config
    (approx top-k decode, the bench configuration).  The b128 sweet spot
    was established in round 2 BEFORE the decode redesign; the decode
    rewrite shifted small-batch economics (b32 416 vs 355), so the
    crossover needs re-measuring (memory rule: re-measure old A/B
    decisions after any upstream change)."""
    from retinanet_tpu.infer import make_inference_fn

    for b in (96, 128, 160, 192, 256):
        try:
            config, levels, model, params, images = _flagship(
                b, size, use_approx_top_k=True)
            full = make_inference_fn(model, levels, config)
            t = timeit(full, params, images)
            print(f"b{b:<4d} {b/t:7.1f} img/s  {t*1e3:7.1f} ms", flush=True)
            del params, images
        except Exception as e:
            print(f"b{b:<4d} failed: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            break


def blockfuse(batch=128, size=640):
    """In-model A/B of the fused whole-bottleneck Pallas serving kernel
    (ops/pallas/bottleneck.py) on the flagship inference program, plus an
    equality check of the two paths on the same random params."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    config, levels, model, params, images = _flagship(
        batch, size, use_approx_top_k=True)
    full = make_inference_fn(model, levels, config)
    t0 = timeit(full, params, images)
    print(f"unfused  {batch/t0:7.1f} img/s  {t0*1e3:7.1f} ms", flush=True)

    cfg_f = dataclasses.replace(
        config, model=dataclasses.replace(config.model, fused_blocks=True))
    model_f = RetinaNet.from_config(cfg_f.model)
    full_f = make_inference_fn(model_f, levels, cfg_f)
    t1 = timeit(full_f, params, images)
    print(f"fused    {batch/t1:7.1f} img/s  {t1*1e3:7.1f} ms  "
          f"({t0/t1:.3f}x)", flush=True)

    # res2 fusion: MOST HBM-bound stage, but 64-wide matmuls + the largest
    # whole-image VMEM residents — measured separately.
    cfg_f2 = dataclasses.replace(
        config, model=dataclasses.replace(
            config.model, fused_blocks=True, fused_res2=True))
    model_f2 = RetinaNet.from_config(cfg_f2.model)
    full_f2 = make_inference_fn(model_f2, levels, cfg_f2)
    try:
        t2 = timeit(full_f2, params, images)
        print(f"fused+r2 {batch/t2:7.1f} img/s  {t2*1e3:7.1f} ms  "
              f"({t0/t2:.3f}x)", flush=True)
    except Exception as e:
        print(f"fused+r2 failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # Output agreement on the real program (bf16 tolerance: conv-vs-dot
    # accumulation order differs inside the kernel).
    a = jax.device_get(full(params, images[:8]))
    bb = jax.device_get(full_f(params, images[:8]))
    for k in ("boxes", "scores", "class_ids"):
        x = np.asarray(getattr(a, k), np.float32)
        y = np.asarray(getattr(bb, k), np.float32)
        print(f"{k}: max|Δ| {np.abs(x - y).max():.4g}", flush=True)


def cost(batch=128, size=640):
    from retinanet_tpu.infer import make_inference_fn
    config, levels, model, params, images = _flagship(batch, size)
    full = make_inference_fn(model, levels, config)
    t = timeit(full, params, images)
    fl, by = _cost(full, params, images)
    print(f"e2e {t*1e3:.2f} ms  {batch/t:.1f} img/s")
    print(f"flops {fl/1e12:.2f} TF ({fl/batch/1e9:.1f} GF/img)  "
          f"bytes {by/1e9:.2f} GB")
    print(f"compute time floor {fl/V5E_BF16_PEAK*1e3:.2f} ms  "
          f"bandwidth floor {by/V5E_HBM_BW*1e3:.2f} ms")
    print(f"MFU {fl/t/V5E_BF16_PEAK*100:.1f}%   "
          f"HBM util {by/t/V5E_HBM_BW*100:.1f}%")


def trace(batch=128, size=640):
    from retinanet_tpu.infer import make_inference_fn
    config, levels, model, params, images = _flagship(batch, size)
    full = make_inference_fn(model, levels, config)
    for _ in range(2):
        out = full(params, images)
    sync(out)
    import glob
    try:
        with jax.profiler.trace("/tmp/jax_trace_r3"):
            for _ in range(3):
                out = full(params, images)
            sync(out)
        files = glob.glob("/tmp/jax_trace_r3/**/*", recursive=True)
        print(f"trace ok, {len(files)} files")
        for f in files[:20]:
            print(" ", f)
    except Exception as e:
        print(f"trace failed: {type(e).__name__}: {e}")


def nmsprof(batch=128, size=640):
    """Attribute the decode+NMS cost (45 ms / 45 GB at b128 in `stages`):
    forward → +decode_levels (full) → +candidate top-k → +suppression
    (pallas and fallback) → +final select."""
    from retinanet_tpu.ops.nms import decode_levels, nms_padded

    config, levels, model, params, images = _flagship(batch, size)
    nms_cfg = config.nms

    def fwd(p, x):
        return model.apply({"params": p}, x, training=False)

    def dec(p, x):
        out = fwd(p, x)
        d = decode_levels(out["classifications"], out["regressions"],
                          levels, x.shape[1:3], nms_cfg)
        return d

    rows = []

    def row(name, jitted):
        t = timeit(jitted, params, images)
        fl, by = _cost(jitted, params, images)
        rows.append((name, t))
        print(f"{name:30s} {t*1e3:8.2f} ms  {by/1e9:7.2f} GB", flush=True)

    row("forward", jax.jit(lambda p, x: jax.tree_util.tree_map(
        lambda v: jnp.sum(v.astype(jnp.float32)), fwd(p, x))))
    row("+decode_levels(full)", jax.jit(
        lambda p, x: [jnp.sum(v.astype(jnp.float32))
                      for v in dec(p, x)[:3]]))

    import jax.numpy as jnp2
    for use_pallas, tag in ((True, "pallas"), (False, "fallback")):
        def full(p, x, up=use_pallas):
            d = dec(p, x)
            return nms_padded(d, iou_threshold=nms_cfg.iou_threshold,
                              max_output_size=nms_cfg.max_output_size,
                              classwise=True, use_pallas=up,
                              pre_nms_top_k=nms_cfg.pre_nms_top_k).scores
        row(f"+nms({tag})", jax.jit(full))


def approx(batch=128, size=640):
    """In-model A/B: exact vs approx_max_k decode."""
    from retinanet_tpu.infer import make_inference_fn
    config, levels, model, params, images = _flagship(batch, size)
    base = make_inference_fn(model, levels, config)
    t0 = timeit(base, params, images)
    print(f"exact top_k:  {t0*1e3:.2f} ms  {batch/t0:.1f} img/s")
    for recall in (0.95, 0.9):
        cfg_a, _, _, _, _ = _flagship(batch, size, use_approx_top_k=True,
                                      approx_top_k_recall=recall)
        fn = make_inference_fn(model, levels, cfg_a)
        t1 = timeit(fn, params, images)
        print(f"approx@{recall}: {t1*1e3:.2f} ms  {batch/t1:.1f} img/s  "
              f"({t0/t1:.3f}x)")


def s2d(batch=128, size=640):
    """Space-to-depth stem probe: 7x7/2 on [S,S,3] vs 4x4/1 on
    [S/2,S/2,12] (the MLPerf ResNet trick).  Isolated probe first; only
    worth a model change if the delta survives in-model."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, size, size, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)
    x_s2d = jnp.asarray(
        rng.randn(batch, size // 2, size // 2, 12), jnp.bfloat16)
    w4 = jnp.asarray(rng.randn(4, 4, 12, 64) * 0.05, jnp.bfloat16)

    @jax.jit
    def stem7(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def stem4(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def stem_s2d_fused(x, w):
        # includes the reshape cost of doing s2d on device from NHWC raw
        b, h, s, c = x.shape
        y = x.reshape(b, h // 2, 2, s // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, s // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    t7 = timeit(stem7, x, w7)
    t4 = timeit(stem4, x_s2d, w4)
    tf_ = timeit(stem_s2d_fused, x, w4)
    fl7 = 2 * batch * (size // 2) ** 2 * 49 * 3 * 64
    fl4 = 2 * batch * (size // 2) ** 2 * 16 * 12 * 64
    print(f"7x7/2 direct:      {t7*1e3:.3f} ms  {fl7/t7/1e12:.1f} TF/s")
    print(f"4x4/1 pre-s2d:     {t4*1e3:.3f} ms  {fl4/t4/1e12:.1f} TF/s")
    print(f"4x4/1 fused s2d:   {tf_*1e3:.3f} ms")


def int8dot():
    """VERDICT r2 #6: is the 394 TOPS int8 MXU path reachable from this
    toolchain AT ALL?  Measures s8×s8→s32 jnp.dot at square matmul shapes
    (the cleanest possible int8 MXU op — no conv lowering in the way) vs
    bf16, plus an im2col-shaped rectangular case matching the head conv."""
    rng = np.random.RandomState(0)
    shapes = [(4096, 4096, 4096), (8192, 8192, 8192),
              (819200, 2304, 256),   # head trunk im2col: B*HW x K x N
              (819200, 2304, 720)]   # head output conv
    for m, k, n in shapes:
        a8 = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
        abf = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        bbf = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

        @jax.jit
        def dot_i8(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        @jax.jit
        def dot_bf(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)

        flops = 2.0 * m * k * n
        try:
            t8 = timeit(dot_i8, a8, b8, iters=10)
        except Exception as e:
            print(f"{m}x{k}x{n} int8 FAILED: {type(e).__name__}: {e}")
            t8 = float("nan")
        tb = timeit(dot_bf, abf, bbf, iters=10)
        print(f"{m}x{k}x{n}: int8 {flops/t8/1e12:7.1f} TOP/s  "
              f"bf16 {flops/tb/1e12:7.1f} TF/s  ratio {tb/t8:.2f}x",
              flush=True)


def supp(batch=128, size=640):
    """In-model A/B of the NMS suppression algorithm (sequential fori_loop
    vs Jacobi fixed-point sweeps) at the bench serving config."""
    from retinanet_tpu.infer import make_inference_fn
    for name, over in (
        ("sequential", dict(use_approx_top_k=True,
                            suppression="sequential")),
        ("jacobi", dict(use_approx_top_k=True, suppression="jacobi")),
    ):
        config, levels, model, params, images = _flagship(batch, size,
                                                          **over)
        fn = make_inference_fn(model, levels, config)
        t = timeit(fn, params, images)
        print(f"{name:12s} b{batch}: {t*1e3:8.2f} ms  "
              f"{batch/t:7.1f} img/s", flush=True)


def supp2(batch=128, size=640):
    """Follow-up to `supp`: approx GLOBAL pre-NMS top-k at the serving
    config (sequential suppression), and b1/b8 latency-caps p50 with
    jacobi suppression (small-N regime where the matvec trade may
    reverse)."""
    from retinanet_tpu.infer import benchmark, make_inference_fn
    from retinanet_tpu.config import Config
    config, levels, model, params, images = _flagship(
        batch, size, use_approx_top_k=True,
        use_approx_global_top_k=True)
    fn = make_inference_fn(model, levels, config)
    t = timeit(fn, params, images)
    print(f"seq+approx_global b{batch}: {t*1e3:8.2f} ms  "
          f"{batch/t:7.1f} img/s", flush=True)
    base = Config()
    for bs in (1, 8):
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model,
                                      backbone="resnet_50_dense"),
            nms=dataclasses.replace(base.nms, top_k_per_level=200,
                                    pre_nms_top_k=400,
                                    use_approx_top_k=True,
                                    suppression="jacobi"))
        r = benchmark(cfg, batch_size=bs, steps=20, warmup=3,
                      num_classes=80)
        print(f"lat_caps_approx_jacobi b{bs}: "
              f"p50 {r['p50_latency_ms']:.1f} ms  "
              f"p99 {r['p99_latency_ms']:.1f} ms", flush=True)


def latency():
    """Serving-latency sweep: b1/b8 p50 across NMS cap configs."""
    from retinanet_tpu.infer import benchmark
    from retinanet_tpu.config import Config
    base = Config()
    for name, over in (
        ("default", {}),
        ("default_nopallas", dict(use_pallas=False)),
        ("lat_caps", dict(top_k_per_level=200, pre_nms_top_k=400)),
        ("lat_caps_nopallas", dict(top_k_per_level=200, pre_nms_top_k=400,
                                   use_pallas=False)),
        ("lat_caps_approx", dict(top_k_per_level=200, pre_nms_top_k=400,
                                 use_approx_top_k=True)),
    ):
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model,
                                      backbone="resnet_50_dense"),
            nms=dataclasses.replace(base.nms, **over))
        for bs in (1, 8):
            r = benchmark(cfg, batch_size=bs, steps=20, warmup=3,
                          num_classes=80)
            print(f"{name:20s} b{bs}: p50 {r['p50_latency_ms']:.1f} ms  "
                  f"p99 {r['p99_latency_ms']:.1f} ms  "
                  f"{r['images_per_sec']:.1f} img/s", flush=True)


if __name__ == "__main__":
    from retinanet_tpu.utils.cli import enable_compilation_cache
    enable_compilation_cache()
    part = sys.argv[1] if len(sys.argv) > 1 else "stages"
    print("backend:", jax.default_backend())
    args = [int(a) for a in sys.argv[2:]]
    dict(stages=stages, cost=cost, trace=trace, approx=approx, s2d=s2d,
         latency=latency, nmsprof=nmsprof, int8dot=int8dot,
         supp=supp, supp2=supp2, trainprof=trainprof,
         trainsweep=trainsweep, assignsweep=assignsweep,
         assignprof=assignprof, infersweep=infersweep,
         blockfuse=blockfuse)[part](*args)
