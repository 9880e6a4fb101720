import time, jax, jax.numpy as jnp, numpy as np
from retinanet_tpu.config import Config
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.infer import make_inference_fn

config = Config()
levels = build_levels(config.anchors)
model = RetinaNet.from_config(config.model, levels.num_anchors, 80)
size = 640; B = 32
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, size, size, 3)), training=False)["params"]
fn = make_inference_fn(model, levels, config)
images = jax.random.normal(rng, (B, size, size, 3), jnp.float32)

out = fn(params, images)
print("first call type:", type(out))
t0=time.perf_counter(); s = float(jnp.sum(out.scores)); print("materialize first:", time.perf_counter()-t0, s)

# timed with device_get
for trial in range(3):
    t0 = time.perf_counter()
    out = fn(params, images)
    s = float(jnp.sum(out.scores))  # forces full execution
    dt = time.perf_counter()-t0
    print(f"trial {trial}: {dt*1e3:.1f} ms -> {B/dt:.1f} img/s")
# block_until_ready comparison
for trial in range(3):
    t0 = time.perf_counter()
    out = fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter()-t0
    print(f"block trial {trial}: {dt*1e3:.1f} ms -> {B/dt:.1f} img/s")
