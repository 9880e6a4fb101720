"""TPU micro-benchmarks for round-2 perf planning (not part of the package).

Measures: int8 vs bf16 conv on MXU at head/backbone shapes, GN cost, and the
per-part forward breakdown of the flagship model.
Run: timeout 600 python _micro_tpu.py [part]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _scalar(x):
    return jnp.sum(x.astype(jnp.float32))


def sync(out):
    # Reduce to a scalar ON DEVICE then fetch — device_get of the full
    # output would measure tunnel transfer, not device time.
    jax.device_get(_scalar(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def conv_bench():
    """bf16 vs int8 3x3 conv at representative shapes."""
    B = 32
    shapes = [
        ("head_P3", (B, 80, 80, 256), 256),
        ("head_P3_out", (B, 80, 80, 256), 720),
        ("res2", (B, 160, 160, 64), 64),
        ("res3_3x3", (B, 80, 80, 128), 128),
        ("res4_3x3", (B, 40, 40, 256), 256),
        ("res2_1x1", (B, 160, 160, 256), 64),
    ]
    rng = np.random.RandomState(0)
    for name, xshape, cout in shapes:
        k = 1 if "1x1" in name else 3
        cin = xshape[-1]
        x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        t_bf16 = timeit(conv_bf16, x, w)

        xi = jnp.asarray(rng.randint(-127, 127, xshape), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, k, cin, cout)), jnp.int8)

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        try:
            t_int8 = timeit(conv_int8, xi, wi)
        except Exception as e:  # noqa
            t_int8 = float("nan")
            print(f"  int8 failed: {type(e).__name__}: {e}")

        flops = 2 * np.prod(xshape[:3]) * k * k * cin * cout
        print(f"{name}: bf16 {t_bf16*1e3:.2f} ms ({flops/t_bf16/1e12:.1f} "
              f"TF/s) | int8 {t_int8*1e3:.2f} ms ({flops/t_int8/1e12:.1f} "
              f"TOP/s) | speedup {t_bf16/t_int8:.2f}x")


def fused_head_bench():
    """Two separate 256ch trunks vs one fused 512ch/2-group trunk."""
    B = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 80, 80, 256), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.05, jnp.bfloat16)

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def separate(x, w1, w2):
        return conv(x, w1), conv(x, w2)

    t_sep = timeit(separate, x, w1, w2)

    x2 = jnp.concatenate([x, x], axis=-1)
    wf = jnp.concatenate([w1, w2], axis=-1)  # [3,3,256,512] groups=2

    @jax.jit
    def fused(x2, wf):
        return conv(x2, wf, groups=2)

    t_fused = timeit(fused, x2, wf)
    flops = 2 * 2 * B * 80 * 80 * 9 * 256 * 256
    print(f"separate 2x(256->256): {t_sep*1e3:.2f} ms ({flops/t_sep/1e12:.1f} TF/s)")
    print(f"fused 512->512 g2:     {t_fused*1e3:.2f} ms ({flops/t_fused/1e12:.1f} TF/s)")

    # layer-1 style: one input, wider output
    @jax.jit
    def wide(x, wf):
        return conv(x, jnp.concatenate([w1, w2], axis=-1))
    t_wide = timeit(wide, x, wf)
    print(f"wide 256->512:         {t_wide*1e3:.2f} ms ({flops/t_wide/1e12:.1f} TF/s)")


def decode_bench():
    """Cost split of decode vs NMS on synthetic head outputs b32@640/80c."""
    sys.path.insert(0, ".")
    from retinanet_tpu.config import Config
    from retinanet_tpu.ops.anchors import build_levels
    from retinanet_tpu.ops.nms import decode_levels, nms_padded

    config = Config()
    levels = build_levels(config.anchors)
    B, size, C, A = 32, 640, 80, 9
    rng = np.random.RandomState(0)
    cls, regr = {}, {}
    for pn in levels:
        g = levels.grid_size(pn, size)
        cls[pn] = jnp.asarray(
            rng.randn(B, g, g, A, C) * 2 - 4, jnp.float32)
        regr[pn] = jnp.asarray(rng.randn(B, g, g, A, 4) * 0.1, jnp.float32)

    @jax.jit
    def decode_only(cls, regr):
        return decode_levels(cls, regr, levels, size, config.nms)

    t = timeit(decode_only, cls, regr, iters=10)
    print(f"decode (5-level top-k): {t*1e3:.2f} ms")

    decoded = decode_only(cls, regr)

    @jax.jit
    def nms_only(decoded):
        return nms_padded(decoded, iou_threshold=0.5, max_output_size=1000,
                          classwise=True, use_pallas=True,
                          pre_nms_top_k=1000)

    t = timeit(nms_only, decoded, iters=10)
    print(f"nms (pallas, 1000 cand): {t*1e3:.2f} ms")

    @jax.jit
    def both(cls, regr):
        return nms_only(decode_only(cls, regr))

    t = timeit(both, cls, regr, iters=10)
    print(f"decode+nms: {t*1e3:.2f} ms")

    # top_k alone at the P3 size (the dominant level)
    flat = jnp.asarray(rng.randn(B, 80 * 80 * A), jnp.float32)

    @jax.jit
    def exact(x):
        return jax.lax.top_k(x, 1000)

    @jax.jit
    def approx(x):
        return jax.lax.approx_max_k(x, 1000, recall_target=0.95)

    print(f"top_k exact P3: {timeit(exact, flat)*1e3:.2f} ms | "
          f"approx: {timeit(approx, flat)*1e3:.2f} ms")


def pallas_conv_bench():
    """Prototype: 3x3 SAME conv as 9 shifted dots in Pallas vs XLA conv.

    Decision gate for a fused head-trunk kernel: if this can't beat XLA's
    ~95 TF/s standalone, the mega-kernel isn't worth building.
    """
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = 32, 80, 80, 256
    HW = H * W

    def kernel(x_hbm, w_ref, out_hbm, x_v, acc, tmp, sem):
        # x_v [HW, C] bf16; acc [HW, C] f32; w_ref [9, C, C] bf16 (VMEM)
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[b], x_v, sem)
        cp.start()
        cp.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
        y_idx = row // W
        x_idx = row % W
        acc[...] = jnp.zeros((HW, C), jnp.float32)
        for t in range(9):
            dy, dx = t // 3 - 1, t % 3 - 1
            shift = dy * W + dx
            # Mosaic has no 16-bit rotate; static slice+concat rolls instead
            # (same expression handles both signs: np.roll(x, -shift)).
            rolled = jnp.concatenate([x_v[shift:], x_v[:shift]], axis=0) \
                if shift else x_v[...]
            valid = ((y_idx + dy >= 0) & (y_idx + dy < H)
                     & (x_idx + dx >= 0) & (x_idx + dx < W))
            shifted = jnp.where(valid, rolled, jnp.bfloat16(0))
            acc[...] += jnp.dot(shifted, w_ref[t],
                                preferred_element_type=jnp.float32)
        tmp[...] = acc[...].astype(jnp.bfloat16)
        cp = pltpu.make_async_copy(tmp, out_hbm.at[b], sem)
        cp.start()
        cp.wait()

    @jax.jit
    def pconv(x, w):
        # x [B, HW, C]; w [9, C, C]
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((B, HW, C), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((HW, C), jnp.bfloat16),
                pltpu.VMEM((HW, C), jnp.float32),
                pltpu.VMEM((HW, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    @jax.jit
    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    t_xla = timeit(xla_conv, x4, wk, iters=10)
    flops = 2 * B * HW * 9 * C * C
    print(f"XLA conv:    {t_xla*1e3:.2f} ms ({flops/t_xla/1e12:.1f} TF/s)")

    x_flat = x4.reshape(B, HW, C)
    w_flat = wk.reshape(9, C, C)
    y_p = pconv(x_flat, w_flat)
    y_x = xla_conv(x4, wk).reshape(B, HW, C)
    err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                - y_x.astype(jnp.float32))))
    print(f"max abs err vs XLA: {err:.4f}")
    t_p = timeit(pconv, x_flat, w_flat, iters=10)
    print(f"pallas conv: {t_p*1e3:.2f} ms ({flops/t_p/1e12:.1f} TF/s)")


def resnext_bench():
    """Cardinality-32 grouped 3×3 conv vs block-diagonal dense conv."""
    B = 16
    cases = [
        ("res2 w128 @160", (B, 160, 160, 128)),
        ("res3 w256 @80", (B, 80, 80, 256)),
        ("res4 w512 @40", (B, 40, 40, 512)),
        ("res5 w1024 @20", (B, 20, 20, 1024)),
    ]
    rng = np.random.RandomState(0)
    G = 32
    for name, xshape in cases:
        c = xshape[-1]
        cg = c // G
        x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
        wg = jnp.asarray(rng.randn(3, 3, cg, c) * 0.05, jnp.bfloat16)

        @jax.jit
        def grouped(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", feature_group_count=G,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        t_g = timeit(grouped, x, wg, iters=10)

        # Block-diagonal dense: same math, 32x the MACs, full MXU tiles.
        mask = np.zeros((1, 1, c, c), np.float32)
        for g in range(G):
            mask[:, :, g * cg:(g + 1) * cg, g * cg:(g + 1) * cg] = 1
        wd = jnp.asarray(np.asarray(
            jnp.repeat(wg.astype(jnp.float32).reshape(3, 3, 1, cg, c),
                       G, axis=2).reshape(3, 3, c, c) * mask),
            jnp.bfloat16)

        @jax.jit
        def dense(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        t_d = timeit(dense, x, wd, iters=10)
        flops = 2 * np.prod(xshape[:3]) * 9 * cg * c
        print(f"{name}: grouped {t_g*1e3:.2f} ms ({flops/t_g/1e12:.1f} TF/s "
              f"useful) | blockdiag dense {t_d*1e3:.2f} ms | "
              f"ratio {t_g/t_d:.2f}")


def dot1x1_bench():
    """1x1 conv as conv_general vs reshape+dot at ResNet bottleneck shapes."""
    B = 32
    cases = [
        ("res2 256->64 @160", (B, 160, 160, 256), 64),
        ("res2 64->256 @160", (B, 160, 160, 64), 256),
        ("res3 512->128 @80", (B, 80, 80, 512), 128),
        ("res4 1024->256 @40", (B, 40, 40, 1024), 256),
        ("res5 512->2048 @20", (B, 20, 20, 512), 2048),
    ]
    rng = np.random.RandomState(0)
    for name, xshape, cout in cases:
        cin = xshape[-1]
        x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
        w = jnp.asarray(rng.randn(1, 1, cin, cout) * 0.05, jnp.bfloat16)

        @jax.jit
        def as_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def as_dot(x, w):
            b, h, wd, c = x.shape
            y = jax.lax.dot_general(
                x.reshape(b * h * wd, c), w.reshape(c, -1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
            return y.reshape(b, h, wd, -1)

        t_conv = timeit(as_conv, x, w)
        t_dot = timeit(as_dot, x, w)
        traffic = (np.prod(xshape) + np.prod(xshape[:3]) * cout) * 2
        roof = traffic / 819e9
        print(f"{name}: conv {t_conv*1e3:.2f} ms | dot {t_dot*1e3:.2f} ms | "
              f"roofline {roof*1e3:.2f} ms")


def gn_bench():
    """XLA two-pass GN vs fused GN+act cost at head/backbone shapes."""
    from retinanet_tpu.models.layers import GroupNorm
    import flax.linen as nn

    for name, shape in [("head", (32, 80, 80, 256)),
                        ("res2", (32, 160, 160, 256)),
                        ("res4", (32, 40, 40, 1024))]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        gn = GroupNorm(groups=32, dtype=jnp.bfloat16)
        params = gn.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def apply(p, x):
            return jax.nn.elu(gn.apply(p, x))

        t = timeit(apply, params, x)
        traffic = np.prod(shape) * 2 * 3  # 2R+1W bf16
        print(f"GN+elu {name} {shape}: {t*1e3:.2f} ms "
              f"({traffic/t/1e9:.0f} GB/s apparent)")


def breakdown():
    """Forward breakdown: backbone / fpn / heads / decode+nms @640 b32."""
    sys.path.insert(0, ".")
    from retinanet_tpu.config import Config
    from retinanet_tpu.models.retinanet import RetinaNet
    from retinanet_tpu.ops.anchors import build_levels
    from retinanet_tpu.infer import make_inference_fn

    config = Config()
    import dataclasses
    config = dataclasses.replace(
        config, model=dataclasses.replace(config.model,
                                          backbone="resnet_50_dense"))
    levels = build_levels(config.anchors)
    model = RetinaNet.from_config(config.model, levels.num_anchors, 80)
    B, size = 32, 640
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)

    full = make_inference_fn(model, levels, config)
    t = timeit(full, params, images, iters=10)
    print(f"full inference: {t*1e3:.1f} ms  {B/t:.0f} img/s")

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    t = timeit(fwd, params, images, iters=10)
    print(f"forward only:   {t*1e3:.1f} ms  {B/t:.0f} img/s")

    # backbone only (C3..C5 consumed so C1/C2 DCE like in the full model)
    @jax.jit
    def backbone_fn(p, x):
        taps = model.apply({"params": p}, x, training=False,
                           method=lambda m, xx, training: m.backbone_net(
                               xx.astype(m.dtype), training=training))
        return [jnp.sum(taps[k].astype(jnp.float32))
                for k in ("C3", "C4", "C5")]

    t = timeit(backbone_fn, params, images, iters=10)
    print(f"backbone (C3-C5 reduced): {t*1e3:.1f} ms")

    @jax.jit
    def bb_fpn(p, x):
        def m_fn(m, xx, training):
            taps = m.backbone_net(xx.astype(m.dtype), training=training)
            td = m.fpn({k: taps[k] for k in ("C3", "C4", "C5")},
                       training=training)
            return [jnp.sum(v.astype(jnp.float32)) for v in td.values()]
        return model.apply({"params": p}, x, training=False, method=m_fn)

    t = timeit(bb_fpn, params, images, iters=10)
    print(f"backbone+fpn (reduced):   {t*1e3:.1f} ms")

    # no-GN ablation: patch GroupNorm to identity and re-init (timing only)
    from retinanet_tpu.models import layers as L
    orig = L.GroupNorm.__call__
    try:
        L.GroupNorm.__call__ = lambda self, x: x.astype(self.dtype)
        model2 = RetinaNet.from_config(config.model, levels.num_anchors, 80)
        params2 = model2.init(rng, jnp.zeros((1, 64, 64, 3)),
                              training=False)["params"]
        fwd2 = jax.jit(
            lambda p, x: model2.apply({"params": p}, x, training=False))
        t = timeit(fwd2, params2, images, iters=10)
        print(f"forward, GN ablated:      {t*1e3:.1f} ms  {B/t:.0f} img/s")
    finally:
        L.GroupNorm.__call__ = orig


if __name__ == "__main__":
    part = sys.argv[1] if len(sys.argv) > 1 else "conv"
    print("backend:", jax.default_backend(), jax.devices())
    if part == "conv":
        conv_bench()
    elif part == "breakdown":
        breakdown()
    elif part == "fused_head":
        fused_head_bench()
    elif part == "dot1x1":
        dot1x1_bench()
    elif part == "resnext":
        resnext_bench()
    elif part == "decode":
        decode_bench()
    elif part == "pconv":
        pallas_conv_bench()
    elif part == "gn":
        gn_bench()
    else:
        raise SystemExit(f"unknown part {part}")
