"""Round-4 TPU measurement harness (VERDICT r3 directives).

In-model A/B runs for this round's levers, one subcommand per TPU process
(tunnel rules: never two TPU processes at once):

    timeout 1800 python _profile_r4.py r2strips [batch] [size]
    timeout 1800 python _profile_r4.py stemfuse [batch] [size]
    timeout 1800 python _profile_r4.py int8head [batch] [size]
    timeout 1800 python _profile_r4.py bwdprof  [batch] [size]

Shares timing/builders with `_profile_r3.py` (same methodology so numbers
are comparable across rounds).
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from _profile_r3 import (V5E_BF16_PEAK, V5E_HBM_BW, _cost, _flagship,
                         sync, timeit)


def r2strips(batch=128, size=640):
    """VERDICT r3 #1: strip-tiled fused res2 bottleneck.  The whole-image
    kernel (strip_rows=0) lost the round-3 A/B because res2's 160×160×256
    images thrash VMEM; the strip kernel bounds residency with two
    [H,W,64] scratch planes.  Sweep strip_rows in-model."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    config, levels, model, params, images = _flagship(
        batch, size, use_approx_top_k=True)
    cfg_f = dataclasses.replace(
        config, model=dataclasses.replace(config.model, fused_blocks=True))
    model_f = RetinaNet.from_config(cfg_f.model, levels.num_anchors, 80)
    full_f = make_inference_fn(model_f, levels, cfg_f)
    t0 = timeit(full_f, params, images)
    print(f"fused(res3+)           {batch/t0:7.1f} img/s  {t0*1e3:7.1f} ms",
          flush=True)

    ref_small = jax.device_get(full_f(params, images[:8]))
    for strip_rows in (0, 20, 40, 80):
        cfg_s = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True,
                fused_res2_strips=strip_rows))
        model_s = RetinaNet.from_config(cfg_s.model, levels.num_anchors, 80)
        full_s = make_inference_fn(model_s, levels, cfg_s)
        try:
            t = timeit(full_s, params, images)
            out = jax.device_get(full_s(params, images[:8]))
            dmax = max(
                float(np.abs(np.asarray(getattr(ref_small, k), np.float32)
                             - np.asarray(getattr(out, k), np.float32)).max())
                for k in ("boxes", "scores"))
            print(f"+res2 strips={strip_rows:<3d}      {batch/t:7.1f} img/s"
                  f"  {t*1e3:7.1f} ms  ({t0/t:.3f}x)  max|d|={dmax:.4g}",
                  flush=True)
        except Exception as e:
            print(f"+res2 strips={strip_rows}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def stemfuse(batch=128, size=640):
    """VERDICT r3 #1b: fused stem probe.  The stem (7x7/2 conv + GN + relu
    + 3x3/2 maxpool) runs at 10% MFU / 50% HBM util (13.2 ms of 241).
    Measure the XLA stem against a Pallas fused stem kernel in isolation
    first — in-model only if the isolated number clears the bar."""
    from retinanet_tpu.ops.pallas.stem import fused_stem
    from retinanet_tpu.models.layers import GroupNorm, max_pool_same

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3), jnp.bfloat16)
    w = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)

    @jax.jit
    def xla_stem(x, w, gamma, beta):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        y = GroupNorm(groups=32).apply(
            {"params": {"gamma": gamma, "beta": beta}}, y)
        return max_pool_same(jnp.maximum(y, 0), 3, 2)

    t0 = timeit(xla_stem, x, w, gamma, beta)
    ref = xla_stem(x, w, gamma, beta)
    print(f"xla stem   {t0*1e3:8.3f} ms", flush=True)

    fused = jax.jit(fused_stem)
    t1 = timeit(fused, x, w, gamma, beta)
    out = fused(x, w, gamma, beta)
    d = np.abs(np.asarray(ref[:4], np.float32)
               - np.asarray(out[:4], np.float32))
    print(f"pallas stem {t1*1e3:8.3f} ms  ({t0/t1:.3f}x)  "
          f"max|d|={d.max():.4g}", flush=True)


def int8head(batch=128, size=640):
    """VERDICT r3 #2: Pallas int8 head kernel with im2col formed in VMEM.
    Isolated A/B at every pyramid-level head shape, then in-model."""
    from retinanet_tpu.ops.pallas.int8_conv import int8_conv3x3

    import functools

    rng = jax.random.PRNGKey(0)
    shapes = [(batch, size // s, size // s, 256) for s in (8, 16, 32, 64, 128)]
    for cout, tag in ((720, "cls-out"), (256, "trunk")):
        w = (jax.random.normal(rng, (3, 3, 256, cout), jnp.float32) * 0.05)
        for (b, h, ww, c) in shapes[:3]:
            x = jax.random.normal(rng, (b, h, ww, c), jnp.bfloat16)

            @jax.jit
            def xla_conv(x, w):
                return jax.lax.conv_general_dilated(
                    x, w.astype(jnp.bfloat16), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)

            flops = 2 * b * h * ww * 9 * c * cout
            t0 = timeit(xla_conv, x, w)
            best = (None, None)
            for sr in (8, 16, 20, 40):
                if sr > h:
                    continue
                t1 = timeit(jax.jit(functools.partial(
                    int8_conv3x3, strip_rows=sr)), x, w)
                if best[0] is None or t1 < best[0]:
                    best = (t1, sr)
            t1, sr = best
            print(f"{tag} P{int(np.log2(size//h))} [{b},{h},{ww},{c}]->"
                  f"{cout}: xla {t0*1e3:7.2f} ms ({flops/t0/1e12:6.1f} TF/s)"
                  f"  pallas-int8 {t1*1e3:7.2f} ms ({flops/t1/1e12:6.1f}"
                  f" TOP/s, {t0/t1:.3f}x, strips={sr})", flush=True)


def int8headmodel(batch=128, size=640):
    """Decisive int8-head measurement: the FULL classification head (4x
    ConvGN(256)+ELU, then the 720-out conv) over all five pyramid levels,
    jitted as one program — XLA bf16 vs the Pallas int8 kernel for every
    3x3 conv.  This keeps XLA's cross-op fusion context (the round-2/3
    lesson: isolated conv numbers mislead in both directions)."""
    import functools

    from retinanet_tpu.ops.pallas.int8_conv import int8_conv3x3

    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(jax.random.fold_in(rng, s),
                               (batch, size // s, size // s, 256),
                               jnp.bfloat16)
             for s in (8, 16, 32, 64, 128)]
    wts = [jax.random.normal(jax.random.fold_in(rng, 100 + i),
                             (3, 3, 256, 256), jnp.float32) * 0.04
           for i in range(4)]
    wout = jax.random.normal(rng, (3, 3, 256, 720), jnp.float32) * 0.04
    gn = [(jnp.ones((256,), jnp.float32), jnp.zeros((256,), jnp.float32))
          for _ in range(4)]

    def gn_elu(y, gamma, beta):
        n, h, w, c = y.shape
        y32 = y.astype(jnp.float32)
        s1 = jnp.sum(y32, axis=(1, 2)).reshape(n, 32, 8).sum(-1)
        s2 = jnp.sum(y32 * y32, axis=(1, 2)).reshape(n, 32, 8).sum(-1)
        cnt = h * w * 8
        mean = (s1 / cnt).repeat(8, -1)
        var = jnp.maximum((s2 / cnt).repeat(8, -1) - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        out = y * jax.lax.broadcast_in_dim(
            (inv * gamma).astype(y.dtype), y.shape, (0, 3)) \
            + jax.lax.broadcast_in_dim(
                (beta - mean * inv * gamma).astype(y.dtype), y.shape, (0, 3))
        return jax.nn.elu(out)

    def head(conv, feats):
        outs = []
        for f in feats:
            x = f
            for i in range(4):
                x = gn_elu(conv(x, wts[i]), *gn[i])
            outs.append(conv(x, wout))
        return outs

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    flops = 2 * 9 * 256 * sum(
        int(np.prod(f.shape[:3])) * (4 * 256 + 720) for f in feats)
    t0 = timeit(jax.jit(functools.partial(head, xla_conv)), feats)
    print(f"xla bf16 head   {t0*1e3:8.2f} ms  "
          f"({flops/t0/1e12:6.1f} TF/s)", flush=True)

    def pconv(x, w):
        # Pallas int8 only where the map is big enough to matter (and for
        # Mosaic's int8 (32,128) tiling): P5-P7 maps stay on XLA bf16.
        if x.shape[1] >= 16:
            return int8_conv3x3(x, w, strip_rows=8)
        return xla_conv(x, w)

    t1 = timeit(jax.jit(functools.partial(head, pconv)), feats)
    print(f"pallas int8 head {t1*1e3:8.2f} ms  "
          f"({flops/t1/1e12:6.1f} TOP/s, {t0/t1:.3f}x)", flush=True)


def rematsweep(size=640):
    """bwdprof found the backbone backward HBM-SATURATED (82-103% util,
    9-27% MFU).  Remat changes the traffic equation: saved activations
    stop round-tripping HBM at the cost of recompute FLOPs — which are
    nearly free at these MFUs.  Measure remat on/off at b16/b32."""
    import dataclasses as dc

    from retinanet_tpu import train as T

    config, *_ = _flagship(1, size)
    for remat in (False, True):
        cfg = dc.replace(
            config, model=dc.replace(config.model, remat=remat))
        for b in (16, 32):
            try:
                r = T.benchmark_train(cfg, batch_size=b, steps=6, warmup=2)
                print(f"remat={int(remat)} b{b:<3d} "
                      f"{r['images_per_sec']:7.1f} img/s  "
                      f"{r['step_ms']:7.1f} ms/step", flush=True)
            except Exception as e:
                print(f"remat={int(remat)} b{b}: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


def bwdprof(batch=16, size=640):
    """VERDICT r3 #4: attribute the 67.3 ms backward.  Cumulative-prefix
    VJPs: grad of loss w.r.t. params with the model truncated at each tap
    (same DCE-prefix methodology as the fwd stage table)."""
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.models.resnet import ResNet50

    config, levels, model, params, _ = _flagship(batch, size)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (batch, size, size, 3), jnp.bfloat16)

    bb = ResNet50()
    bparams = bb.init(rng, jnp.zeros((1, 64, 64, 3)),
                      training=False)["params"]

    taps = ["C2", "C3", "C4", "C5"]
    prev = 0.0
    for tap in taps:
        def loss_fn(p, tap=tap):
            outs = bb.apply({"params": p}, x, training=True)
            return jnp.sum(outs[tap].astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss_fn))
        t = timeit(g, bparams)
        flops, bts = _cost(g, bparams)
        print(f"bwd-through-{tap}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:7.2f})"
              f"  MFU {flops/t/V5E_BF16_PEAK*100:5.1f}%"
              f"  HBM {bts/t/V5E_HBM_BW*100:5.1f}%", flush=True)
        prev = t


def fusedstages(batch=128, size=640):
    """Refreshed cumulative stage table on the ROUND-4 serving config
    (fused whole-bottleneck res3+ AND strip-tiled fused res2): where does
    the remaining time sit after the fusions?  Same methodology/printout
    as `_profile_r3.py stages` (monkeypatches its flagship builder)."""
    import _profile_r3 as r3
    from retinanet_tpu.models.retinanet import RetinaNet

    orig = r3._flagship

    def fused_flagship(batch, size, **kw):
        config, levels, model, params, images = orig(batch, size, **kw)
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        return cfg, levels, model_f, params, images

    r3._flagship = fused_flagship
    try:
        r3.stages(batch, size)
    finally:
        r3._flagship = orig


def batchsweep(size=640):
    """Serving batch sweep on the round-4 fused config (the b128 sweet spot
    was chosen before the res2/res3+ fusions changed the VMEM picture).
    Also probes the one untested decode lever at b128: approx GLOBAL
    pre-NMS top-k on top of the per-level approx_max_k."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    for b, glob in ((96, False), (128, False), (128, True), (160, False),
                    (192, False), (256, False)):
        config, levels, model, params, images = _flagship(
            b, size, use_approx_top_k=True)
        cfg = dataclasses.replace(
            config,
            model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True),
            nms=dataclasses.replace(config.nms,
                                    use_approx_global_top_k=glob))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        fn = make_inference_fn(model_f, levels, cfg)
        tag = " +global-approx" if glob else ""
        try:
            t = timeit(fn, params, images)
            print(f"b{b:<4d}{tag:15s} {b/t:7.1f} img/s  {t*1e3:7.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"b{b}{tag}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def gnbwd(size=640):
    """VERDICT r3 #4 'at minimum': the Pallas fwd+bwd GroupNorm custom_vjp
    (ops/pallas/groupnorm.py) in the REAL train step.  Round 2 rejected the
    kernel on the serving forward (layout transposes); the training
    question — does its bwd traffic saving win where the backward is
    82-103% HBM-bound? — was never measured."""
    import functools

    from retinanet_tpu import train as T
    from retinanet_tpu.models import densenet, layers, mobilenet_v2, resnet

    config, *_ = _flagship(1, size)

    def run(tag):
        for b in (16, 32):
            try:
                r = T.benchmark_train(config, batch_size=b, steps=6,
                                      warmup=2)
                print(f"{tag} b{b:<3d} {r['images_per_sec']:7.1f} img/s  "
                      f"{r['step_ms']:7.1f} ms/step", flush=True)
            except Exception as e:
                print(f"{tag} b{b}: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)

    run("gn=xla   ")
    mods = (layers, resnet, densenet, mobilenet_v2)
    orig = layers.GroupNorm
    patched = functools.partial(orig, use_pallas=True)
    for m in mods:
        m.GroupNorm = patched
    try:
        run("gn=pallas")
    finally:
        for m in mods:
            m.GroupNorm = orig


def fusedtrain(size=640):
    """VERDICT r3 #4, the real lever: the hand-fused Pallas backward
    (ops/pallas/bottleneck_bwd.py) in the full train step.  bwdprof proved
    the XLA backward HBM-saturated (82-103%) and rematsweep proved XLA
    remat ADDS traffic; the fused bwd recomputes in VMEM — ~3 image passes
    per identity block (x, dout, dx) vs XLA's ~12."""
    import functools

    from retinanet_tpu import train as T

    config, *_ = _flagship(1, size)

    for tag, fused in (("xla  ", False), ("pallas", True)):
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              fused_train=fused))
        for b in (16, 32):
            try:
                r = T.benchmark_train(cfg, batch_size=b, steps=6, warmup=2)
                print(f"bwd={tag} b{b:<3d} {r['images_per_sec']:7.1f} img/s"
                      f"  {r['step_ms']:7.1f} ms/step", flush=True)
            except Exception as e:
                print(f"bwd={tag} b{b}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


def r4levers(batch=128, size=640):
    """In-model A/B of the two new serving levers on top of the adopted
    round-4 config (fused blocks + res2 strips=20, approx top-k):
    fused_proj (stride-1 projection block kernel) and fused_res3_strips."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    config, levels, _, params, images = _flagship(batch, size,
                                                  use_approx_top_k=True)
    variants = (
        ("baseline (res2 strips=20)", {}),
        ("+fused_proj", {"fused_proj": True}),
        ("+res3 strips=10", {"fused_res3_strips": 10}),
        ("+res3 strips=20", {"fused_res3_strips": 20}),
        ("+res3 strips=40", {"fused_res3_strips": 40}),
        ("+proj +res3s20", {"fused_proj": True, "fused_res3_strips": 20}),
    )
    for name, kw in variants:
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True, **kw))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        fn = make_inference_fn(model_f, levels, cfg)
        try:
            t = timeit(fn, params, images)
            print(f"{name:28s} {batch/t:7.1f} img/s  {t*1e3:7.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def r4levers2(batch=128, size=640):
    """Third serving-lever sweep on top of the adopted round-4 config
    (fused blocks + res2 strips=20 + res3 strips=10, approx top-k):
    strip-tiling res4."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    config, levels, _, params, images = _flagship(batch, size,
                                                  use_approx_top_k=True)
    variants = (
        ("baseline (res3 strips=10)", {}),
        ("+res4 strips=10", {"fused_res4_strips": 10}),
        ("+res4 strips=20", {"fused_res4_strips": 20}),
    )
    for name, kw in variants:
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True,
                fused_res3_strips=10, **kw))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        fn = make_inference_fn(model_f, levels, cfg)
        try:
            t = timeit(fn, params, images)
            print(f"{name:28s} {batch/t:7.1f} img/s  {t*1e3:7.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def point(batch=128, size=640):
    """One number: the adopted serving config (fused + res2 strips=20 +
    res3 strips=10, approx top-k) at the given batch.  For XLA-flags A/Bs —
    each flag set needs a fresh process (XLA_FLAGS is read at init)."""
    import os

    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    config, levels, _, params, images = _flagship(batch, size,
                                                  use_approx_top_k=True)
    cfg = dataclasses.replace(
        config, model=dataclasses.replace(
            config.model, fused_blocks=True, fused_res2=True,
            fused_res3_strips=10))
    model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
    fn = make_inference_fn(model_f, levels, cfg)
    t = timeit(fn, params, images)
    print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r:60s} "
          f"b{batch} {batch/t:7.1f} img/s  {t*1e3:7.1f} ms", flush=True)


def batchsweep2(size=640):
    """Batch sweep under the adopted round-4 strip config (strips cut VMEM
    residency, which may move the throughput sweet spot past b128)."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet

    for batch in (128, 160, 192, 256):
        config, levels, _, params, images = _flagship(batch, size,
                                                      use_approx_top_k=True)
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True,
                fused_res3_strips=10))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        fn = make_inference_fn(model_f, levels, cfg)
        try:
            t = timeit(fn, params, images)
            print(f"b{batch:<4d} {batch/t:7.1f} img/s  {t*1e3:7.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"b{batch}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def bwdstrips(size=640):
    """Sweep the fused-backward strip size in the full train step at b32
    (the fusedtrain winner config): more rows per strip = fewer DMA round
    trips and bigger dots; fewer rows = lower VMEM residency."""
    from retinanet_tpu import train as T

    config, *_ = _flagship(1, size)
    for rows in (10, 20, 40, 80):
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              fused_train=True,
                                              fused_bwd_strip_rows=rows))
        try:
            r = T.benchmark_train(cfg, batch_size=32, steps=6, warmup=2)
            print(f"bwd strips={rows:<3d} {r['images_per_sec']:7.1f} img/s"
                  f"  {r['step_ms']:7.1f} ms/step", flush=True)
        except Exception as e:
            print(f"bwd strips={rows}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def stride2probe(batch=8, size=640):
    """Go/no-go micro-probe for fusing the stride-2 'down' blocks: is a
    3×3/2 conv expressible as 9 STRIDED-tap dots inside a Pallas kernel at
    a sane fraction of the XLA conv's speed?  Strided sublane reads are the
    suspected Mosaic relayout cost (the stem-fusion lesson) — measure them
    in isolation before building the full down-block kernel.

    Shape: res3-b0's conv2 input a1 = [160,160,128] at 640px.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = w = size // 4
    f = 128
    ho, wo = h // 2, w // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, h, w, f), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, f, f) * 0.05, jnp.bfloat16)

    def xla_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def kernel(x_ref, k_ref, o_ref):
        # SAME for stride 2, k=3, even input: pad (0,1)×(0,1); out[p,q] =
        # Σ x[2p+dy, 2q+dx]·k[dy,dx] with dy,dx ∈ {0,1,2} on the padded map.
        xp = jnp.pad(x_ref[0], ((0, 1), (0, 1), (0, 0)))
        acc = jnp.zeros((ho * wo, f), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(
                    xp, (dy, dx, 0), (dy + 2 * ho - 1, dx + 2 * wo - 1, f),
                    (2, 2, 1))
                acc = acc + jnp.dot(tap.reshape(ho * wo, f), k_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16).reshape(ho, wo, f)

    def pallas_conv(x, k):
        return pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=[pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec(k.shape, lambda i: (0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, ho, wo, f), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, ho, wo, f), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(x, k)

    ref = jax.jit(xla_conv)(x, k)
    try:
        out = jax.jit(pallas_conv)(x, k)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - out.astype(jnp.float32))))
        print(f"max abs err vs XLA conv: {err:.4f}", flush=True)
        t_x = timeit(jax.jit(xla_conv), x, k)
        t_p = timeit(jax.jit(pallas_conv), x, k)
        print(f"xla 3x3/2 conv   {t_x*1e3:7.2f} ms", flush=True)
        print(f"pallas strided   {t_p*1e3:7.2f} ms  ({t_x/t_p:.2f}x)",
              flush=True)
    except Exception as e:
        print(f"pallas strided taps: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def accumcheck(batch=32, size=640):
    """Attribution probe for the r4 focal-eff128 explosion: is grad-accum
    faithful at the REAL scale (flagship @640, focal loss), or is the
    divergence a genuine large-effective-batch optimization fact?

    Runs ONE optimizer step from the same initial state with accum=1 vs
    accum=4 on the same b32 batch and reports loss / grad-norm / update
    deltas.  Exact equality is NOT expected (focal normalizes by each
    micro-batch's own fg count), but accum must not scale gradients."""
    from retinanet_tpu import train as T
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.ops.anchors import build_levels

    config, *_ = _flagship(1, size)
    config = dataclasses.replace(
        config, loss=dataclasses.replace(config.loss,
                                         class_losses=("focal",)))
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model, levels.num_anchors, 80)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32)
    max_boxes = config.assign.max_boxes
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    boxes[:, 1] = [0.5, 0.4, 0.9, 0.8]
    mask = np.zeros((batch, max_boxes), bool)
    mask[:, :2] = True
    args = (images, jnp.asarray(boxes),
            jnp.zeros((batch, max_boxes), jnp.int32), jnp.asarray(mask),
            jax.random.PRNGKey(1))

    results = {}
    state0 = T.create_train_state(model, config, jax.random.PRNGKey(0))
    for accum in (1, 4):
        cfg = dataclasses.replace(
            config, train=dataclasses.replace(config.train,
                                              grad_accum=accum))
        step_fn = jax.jit(T.make_train_step(model, levels, cfg,
                                            with_metrics=False))
        new_state, metrics = step_fn(state0, *args)
        results[accum] = (jax.device_get(new_state.params),
                          {k: float(v) for k, v in metrics.items()})
        m = results[accum][1]
        print(f"accum={accum}  total {m['total_loss']:.5f}  class "
              f"{m['class_loss']:.5f}  grad_norm {m['grad_norm']:.5f}",
              flush=True)

    p1, p4 = results[1][0], results[4][0]
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat4 = dict(jax.tree_util.tree_leaves_with_path(p4))
    p0 = jax.device_get(state0.params)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(p0))
    worst = []
    for path, a1 in flat1:
        a4, a0 = flat4[path], flat0[path]
        u1, u4 = a1 - a0, a4 - a0  # the applied updates
        denom = max(np.abs(u1).max(), 1e-12)
        rel = float(np.abs(u1 - u4).max() / denom)
        ratio = float(np.linalg.norm(u4) / max(np.linalg.norm(u1), 1e-12))
        worst.append((rel, ratio, jax.tree_util.keystr(path)))
    worst.sort(reverse=True)
    print("worst update mismatches (rel-max-diff, |u4|/|u1|, param):",
          flush=True)
    for rel, ratio, name in worst[:8]:
        print(f"  {rel:9.4f}  {ratio:7.3f}  {name}", flush=True)
    ratios = np.array([w[1] for w in worst])
    print(f"update-norm ratio |u4|/|u1|: median {np.median(ratios):.4f} "
          f"min {ratios.min():.4f} max {ratios.max():.4f}", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1]
    args = [int(a) for a in sys.argv[2:]]
    globals()[cmd](*args)
