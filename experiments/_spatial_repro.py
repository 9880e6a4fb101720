"""Repro + fix check for the spatial-mesh backward resharding (VERDICT r3
#5): compile the 2-D (data x space) train step on a virtual 8-CPU mesh and
report any 'Involuntary full rematerialization' SPMD warnings on stderr.

    JAX_PLATFORMS=cpu python _spatial_repro.py 2>&1 | grep -c Involuntary
"""
import dataclasses
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from retinanet_tpu.config import (AssignConfig, Config, DataConfig,  # noqa
                                  ModelConfig, ParallelConfig, TrainConfig)
from retinanet_tpu.models.retinanet import RetinaNet  # noqa: E402
from retinanet_tpu.ops.anchors import build_levels  # noqa: E402
from retinanet_tpu.parallel.mesh import (batch_sharding, image_sharding,  # noqa
                                         make_mesh, replicated)
from retinanet_tpu.train import create_train_state, make_train_step  # noqa


def main():
    size, batch = 64, 8
    config = Config(
        model=ModelConfig(backbone="resnet_50", num_classes=3,
                          dropout_rate=0.0),
        data=DataConfig(dataset=("shapes",), image_size=size,
                        batch_size=batch),
        assign=AssignConfig(max_boxes=4),
        train=TrainConfig(experiment="/tmp/unused"),
        parallel=ParallelConfig(num_devices=8, spatial=2))
    levels = build_levels(config.anchors)
    mesh = make_mesh(config.parallel)
    model = RetinaNet.from_config(config.model, levels.num_anchors, 3,
                                  mesh=mesh)
    repl, data = replicated(mesh), batch_sharding(mesh)
    img = image_sharding(mesh)
    state = jax.device_put(
        create_train_state(model, config, jax.random.PRNGKey(0)), repl)
    step = jax.jit(make_train_step(model, levels, config),
                   in_shardings=(repl, img, data, data, data, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    boxes = jnp.asarray(rng.rand(batch, 8, 4) * 0.5, jnp.float32)
    ids = jnp.zeros((batch, 8), jnp.int32)
    mask = jnp.ones((batch, 8), bool)
    db = (jax.device_put(images, img), jax.device_put(boxes, data),
          jax.device_put(ids, data), jax.device_put(mask, data))
    state, metrics = step(state, *db,
                          jax.device_put(jax.random.PRNGKey(1), repl))
    jax.block_until_ready(metrics)
    print("STEP_OK total_loss", float(metrics["total_loss"]), flush=True)


if __name__ == "__main__":
    main()
