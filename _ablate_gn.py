"""Ablate GroupNorm cost in the ResNet-50 backbone on TPU."""
import time, functools
import jax, jax.numpy as jnp
import flax.linen as nn

B, size = 32, 640
rng = jax.random.PRNGKey(0)
def log(*a): print(*a, flush=True)

def bench(name, fn, args, steps=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][..., :1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][..., :1])
    dt = (time.perf_counter() - t0) / steps
    log(f"{name}: {dt*1e3:.2f} ms/batch ({B/dt:.0f} img/s)")

class GN(nn.Module):
    mode: str  # f32 | bf16 | none
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(32, c)
        while c % g: g -= 1
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        if self.mode == "none":
            return x
        dt = jnp.float32 if self.mode == "f32" else jnp.bfloat16
        xr = x.astype(dt).reshape(n, h, w, g, c // g)
        mean = jnp.mean(xr, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xr - mean), axis=(1, 2, 4), keepdims=True)
        xr = (xr - mean) * jax.lax.rsqrt(var.astype(jnp.float32) + 1e-5).astype(dt)
        return (xr.reshape(n, h, w, c) * gamma + beta).astype(x.dtype)

class GN2(nn.Module):
    """Two-pass channel-stat GN: per-channel sums then affine per channel."""
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(32, c)
        while c % g: g -= 1
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        # Per-channel moments in f32 (small output), then combine per group.
        s1 = jnp.sum(x.astype(jnp.float32), axis=(1, 2))        # [n, c]
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
        cnt = h * w * (c // g)
        s1g = s1.reshape(n, g, c // g).sum(-1, keepdims=True)   # [n,g,1]
        s2g = s2.reshape(n, g, c // g).sum(-1, keepdims=True)
        mean = s1g / cnt
        var = s2g / cnt - mean * mean
        scale = (jax.lax.rsqrt(var + 1e-5) * gamma.reshape(g, c // g)[None])
        shift = beta.reshape(g, c // g)[None] - mean * scale
        scale = scale.reshape(n, 1, 1, c).astype(x.dtype)
        shift = shift.reshape(n, 1, 1, c).astype(x.dtype)
        return x * scale + shift

def conv(x, f, k, s=1, name=None):
    return nn.Conv(f, (k, k), (s, s), padding="SAME", use_bias=False,
                   dtype=jnp.bfloat16, param_dtype=jnp.float32, name=name)(x)

def make_backbone(mode):
    class Block(nn.Module):
        f: int; project: object
        @nn.compact
        def __call__(self, x):
            idn = x
            s = 2 if self.project == "down" else 1
            def norm(y):
                if mode == "2pass":
                    return GN2()(y)
                return GN(mode=mode)(y)
            if self.project:
                idn = norm(conv(idn, self.f * 4, 1, s))
            x = jax.nn.relu(norm(conv(x, self.f, 1)))
            x = jax.nn.relu(norm(conv(x, self.f, 3, s)))
            x = norm(conv(x, self.f * 4, 1))
            return jax.nn.relu(x + idn)

    class BB(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.astype(jnp.bfloat16)
            if mode == "2pass":
                x = jax.nn.relu(GN2()(conv(x, 64, 7, 2)))
            else:
                x = jax.nn.relu(GN(mode=mode)(conv(x, 64, 7, 2)))
            x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
            for f, d, down in ((64, 3, False), (128, 4, True), (256, 6, True),
                               (512, 3, True)):
                for i in range(d):
                    x = Block(f, ("down" if down else True) if i == 0 else False)(x)
            return x
    return BB()

images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)
for mode in ("f32", "bf16", "2pass", "none"):
    bb = make_backbone(mode)
    params = bb.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    fn = jax.jit(lambda p, x, m=bb: m.apply({"params": p}, x))
    bench(f"resnet50_gn_{mode}", fn, (params, images))
