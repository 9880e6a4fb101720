import time, sys
import jax, jax.numpy as jnp, numpy as np
from retinanet_tpu.config import Config, NMSConfig
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.ops.nms import decode_levels, nms_padded

def log(*a):
    print(*a, flush=True)

import dataclasses
backbone = sys.argv[2] if len(sys.argv) > 2 else "resnet_50_dense"
config = Config()
config = dataclasses.replace(
    config, model=dataclasses.replace(config.model, backbone=backbone))
levels = build_levels(config.anchors)
model = RetinaNet.from_config(config.model, levels.num_anchors, 80)
size = 640
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = jax.random.PRNGKey(0)
t0 = time.perf_counter()
params = model.init(rng, jnp.zeros((1, 64, 64, 3)), training=False)["params"]
jax.device_get(jax.tree_util.tree_leaves(params)[0])
log("init done", time.perf_counter() - t0)
images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)

def timeit(name, fn, sync, steps=10):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    log(name, "compile+first:", round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / steps
    log(name, f"per-step: {dt*1e3:.1f} ms -> {B/dt:.1f} img/s")

# stage 1: forward only
fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
timeit("forward", lambda: fwd(params, images),
       lambda o: jax.device_get(o["classifications"]["P7"]))

# stage 2: forward + decode (top-k)
def f2(p, x):
    out = model.apply({"params": p}, x, training=False)
    return decode_levels(out["classifications"], out["regressions"], levels,
                         size, config.nms)
f2j = jax.jit(f2)
timeit("fwd+decode", lambda: f2j(params, images),
       lambda o: jax.device_get(o.scores))

# stage 3: + jax fallback NMS (with production pre-NMS cap)
def f3(p, x):
    d = f2(p, x)
    return nms_padded(d, use_pallas=False,
                      pre_nms_top_k=config.nms.pre_nms_top_k)
f3j = jax.jit(f3)
timeit("fwd+decode+jaxnms", lambda: f3j(params, images),
       lambda o: jax.device_get(o.scores))

# stage 4: + pallas NMS (with production pre-NMS cap)
def f4(p, x):
    d = f2(p, x)
    return nms_padded(d, use_pallas=True,
                      pre_nms_top_k=config.nms.pre_nms_top_k)
f4j = jax.jit(f4)
timeit("fwd+decode+pallasnms", lambda: f4j(params, images),
       lambda o: jax.device_get(o.scores))
