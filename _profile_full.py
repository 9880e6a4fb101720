import time, sys
import jax, jax.numpy as jnp, numpy as np
from retinanet_tpu.config import Config
import dataclasses
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.models.resnet import ResNet50
from retinanet_tpu.ops.anchors import build_levels

B = 32
size = 640
rng = jax.random.PRNGKey(0)
def log(*a): print(*a, flush=True)

def bench(name, fn, args, steps=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][..., :1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][..., :1])
    dt = (time.perf_counter() - t0) / steps
    log(f"{name}: {dt*1e3:.2f} ms/batch ({B/dt:.0f} img/s)")

images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)

for nc in (80, 3):
    cfg = Config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone="resnet_50_dense", num_classes=nc))
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, levels.num_anchors, nc)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)), training=False)["params"]
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    bench(f"full_fwd_{nc}cls", fn, (params, images))

bb = ResNet50(dtype=jnp.bfloat16)
bb_params = bb.init(rng, jnp.zeros((1, 64, 64, 3)), training=False)["params"]
bb_fn = jax.jit(lambda p, x: bb.apply({"params": p}, x, training=False))
bench("backbone_only", bb_fn, (bb_params, images))
