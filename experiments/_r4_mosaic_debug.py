"""Bisect the real-TPU Mosaic compile failures of round 4.

`_profile_r4.py fusedtrain` (b16/b32) and `gnbwd` (b32) die with an opaque
tunnel error: `HTTP 500: tpu_compile_helper subprocess exit code 1` — the
Mosaic compiler subprocess crashes server-side and the tunnel hides the
message.  This harness compiles each suspect kernel STANDALONE, one shape
at a time (smallest first), printing the full exception so the failing
stage/shape is pinned.  One TPU process at a time, per tunnel rules.

    timeout 3600 python _r4_mosaic_debug.py bwd     # bottleneck_bwd shapes
    timeout 3600 python _r4_mosaic_debug.py gn      # groupnorm bwd shapes
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

# Identity-block shapes of the dense ResNet-50 at 640px input:
# (h, w, c, f).  res5 smallest VMEM first.
BLOCK_SHAPES = (
    ("res5", 20, 20, 2048, 512),
    ("res4", 40, 40, 1024, 256),
    ("res3", 80, 80, 512, 128),
    ("res2", 160, 160, 256, 64),
)


def _try(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK    {name}  {time.perf_counter() - t0:6.1f}s", flush=True)
        return True
    except Exception:
        print(f"FAIL  {name}", flush=True)
        traceback.print_exc()
        print("-" * 70, flush=True)
        return False


def bwd(batch=2):
    from retinanet_tpu.ops.pallas.bottleneck_bwd import fused_bottleneck_bwd

    rng = np.random.RandomState(0)
    for name, h, w, c, f in BLOCK_SHAPES:
        x = jnp.asarray(rng.randn(batch, h, w, c), jnp.bfloat16)
        dout = jnp.asarray(rng.randn(batch, h, w, c), jnp.bfloat16)
        k1 = jnp.asarray(rng.randn(1, 1, c, f) * 0.05, jnp.bfloat16)
        k2 = jnp.asarray(rng.randn(3, 3, f, f) * 0.05, jnp.bfloat16)
        k3 = jnp.asarray(rng.randn(1, 1, f, c) * 0.05, jnp.bfloat16)
        g = lambda n: jnp.ones((n,), jnp.float32)
        b = lambda n: jnp.zeros((n,), jnp.float32)
        for strip_rows in (20, 10):
            _try(f"bwd {name} [{h}x{w}x{c}] strips={strip_rows}",
                 lambda: fused_bottleneck_bwd(
                     x, dout, k1, g(f), b(f), k2, g(f), b(f), k3, g(c),
                     b(c), strip_rows=strip_rows))


def gn(batch=32):
    """GroupNorm custom_vjp kernel at the b32 flagship shapes (b16 compiled
    and ran; b32 crashed the compiler)."""
    from retinanet_tpu.models.layers import resolve_groups
    from retinanet_tpu.ops.pallas.groupnorm import fused_group_norm_act

    rng = np.random.RandomState(0)
    # The largest GN activations in the flagship train step at 640px.
    for name, h, w, c in (("res5gn", 20, 20, 2048),
                          ("res2gn", 160, 160, 256),
                          ("stemgn", 320, 320, 64)):
        for b_ in (16, batch):
            x = jnp.asarray(rng.randn(b_, h, w, c), jnp.bfloat16)
            gamma = jnp.ones((c,), jnp.float32)
            beta = jnp.zeros((c,), jnp.float32)
            groups = resolve_groups(c)

            def run(x=x, gamma=gamma, beta=beta, groups=groups):
                def f(x, g, bb):
                    return jnp.sum(fused_group_norm_act(
                        x, g, bb, groups, 1e-5, "relu").astype(jnp.float32))
                return jax.jit(jax.grad(f, argnums=(0, 1, 2)))(x, gamma,
                                                               beta)

            _try(f"gn {name} b{b_} [{h}x{w}x{c}]", run)


if __name__ == "__main__":
    globals()[sys.argv[1]]()
