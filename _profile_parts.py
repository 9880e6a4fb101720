import time, sys
import jax, jax.numpy as jnp, numpy as np
from retinanet_tpu.config import Config
from retinanet_tpu.models.resnet import ResNet50
from retinanet_tpu.models.fpn import FPN
from retinanet_tpu.models.heads import ClassificationSubnet, RegressionSubnet

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
size = 640
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
    return dt

# backbone
bb = ResNet50(dtype=jnp.bfloat16)
x64 = jnp.zeros((1, 64, 64, 3))
bb_params = bb.init(rng, x64, training=False)["params"]
images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)
bb_fn = jax.jit(lambda p, x: bb.apply({"params": p}, x, training=False))
t_bb = bench("backbone", bb_fn, (bb_params, images))

# fpn on realistic C shapes
cs = {"C3": jax.random.normal(rng, (B, 80, 80, 512), jnp.bfloat16),
      "C4": jax.random.normal(rng, (B, 40, 40, 1024), jnp.bfloat16),
      "C5": jax.random.normal(rng, (B, 20, 20, 2048), jnp.bfloat16)}
fpn = FPN(dtype=jnp.bfloat16)
fpn_params = fpn.init(rng, {k: v[:1] for k, v in cs.items()},
                      training=False)["params"]
fpn_fn = jax.jit(lambda p, c: fpn.apply({"params": p}, c, training=False))
t_fpn = bench("fpn", fpn_fn, (fpn_params, cs))

# heads per level
cls_head = ClassificationSubnet(num_anchors=9, num_classes=80,
                                dtype=jnp.bfloat16)
reg_head = RegressionSubnet(num_anchors=9, dtype=jnp.bfloat16)
p3 = jax.random.normal(rng, (B, 80, 80, 256), jnp.bfloat16)
cls_params = cls_head.init(rng, p3[:1], training=False)["params"]
reg_params = reg_head.init(rng, p3[:1], training=False)["params"]

for g, name in ((80, "P3"), (40, "P4"), (20, "P5"), (10, "P6"), (5, "P7")):
    feat = jax.random.normal(rng, (B, g, g, 256), jnp.bfloat16)
    fn = jax.jit(lambda cp, rp, f: (
        cls_head.apply({"params": cp}, f, training=False),
        reg_head.apply({"params": rp}, f, training=False)))
    bench(f"heads@{name}({g}x{g})", fn, (cls_params, reg_params, feat))
