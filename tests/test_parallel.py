"""Parallel backends: mesh helpers + shard_map step vs single-device step."""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.config import (
    AssignConfig, Config, DataConfig, ModelConfig, TrainConfig)
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch)
from retinanet_tpu.parallel.shard_map_step import make_shard_map_train_step
from retinanet_tpu.train import create_train_state, make_train_step


def _cfg(tmp_path):
    return Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=8),
        assign=AssignConfig(max_boxes=8),
        train=TrainConfig(experiment=str(tmp_path), learning_rate=1e-2),
    )


def _batch(rng, batch, size, max_boxes):
    images = rng.randn(batch, size, size, 3).astype(np.float32)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    ids = np.zeros((batch, max_boxes), np.int32)
    mask = np.zeros((batch, max_boxes), bool)
    mask[:, 0] = True
    return images, boxes, ids, mask


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    x = np.zeros((8, 4), np.float32)
    sharded = shard_batch(x, mesh)
    assert sharded.sharding.spec == batch_sharding(mesh).spec
    y = jax.device_put(np.zeros(3), replicated(mesh))
    assert y.sharding.is_fully_replicated


def test_shard_map_step_matches_single_device(tmp_path):
    cfg = _cfg(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)

    np_rng = np.random.RandomState(0)
    images, boxes, ids, mask = _batch(np_rng, 8, 64, 8)
    images += np_rng.randn(*images.shape).astype(np.float32) * 0.1
    rng = jax.random.PRNGKey(5)

    # Single-device reference step.
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s1, m1 = jax.jit(make_train_step(model, levels, cfg))(
        state0, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(ids),
        jnp.asarray(mask), rng)

    # shard_map over the 8-device mesh.
    mesh = make_mesh()
    step = make_shard_map_train_step(model, levels, cfg, mesh)
    state0b = jax.device_put(
        create_train_state(model, cfg, jax.random.PRNGKey(0)),
        replicated(mesh))
    db = shard_batch((images, boxes, ids, mask), mesh)
    s8, m8 = step(state0b, *db, jax.device_put(rng, replicated(mesh)))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m8["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_distributed_helpers_single_process():
    from retinanet_tpu.parallel import distributed
    # Single process: initialize is a no-op guard; slicing covers the batch.
    distributed.initialize(num_processes=1)
    start, size = distributed.process_batch_slice(8)
    assert (start, size) == (0, 8)
    mesh = make_mesh()
    arr = distributed.global_batch_from_local(
        np.zeros((8, 4), np.float32), mesh)
    assert arr.shape == (8, 4)
    # allgather_pyobjs: identity list single-process (arbitrary pickle-able
    # payload; the 2-process path is covered by test_multihost's eval).
    obj = {"records": [(3, {"boxes": np.zeros((2, 4))})], "s": "x"}
    out = distributed.allgather_pyobjs(obj)
    assert len(out) == 1 and out[0] is obj


def test_shard_loader_partitions_dataset():
    from retinanet_tpu.data.loaders.shapes import Shapes
    from retinanet_tpu.parallel.distributed import shard_loader

    loader = Shapes(None, 10, (64, 64))
    shards = [shard_loader(loader, i, 3) for i in range(3)]
    assert shard_loader(loader, 0, 1) is loader  # no-op single process
    # Disjoint cover with correct lengths.
    assert [len(s) for s in shards] == [4, 3, 3]
    seen = []
    for s in shards:
        items = list(s)
        assert len(items) == len(s)
        seen.extend(np.asarray(x["boxes"]).tobytes() for x in items)
    full = [np.asarray(x["boxes"]).tobytes() for x in loader]
    assert sorted(seen) == sorted(full)
    assert shards[0].num_classes == loader.num_classes
    assert shards[0].class_names == loader.class_names


def test_global_batch_from_local_matches_shard_batch():
    """Single-process assembly path (what the Trainer now uses) must equal
    the plain sharded device_put."""
    from retinanet_tpu.parallel import distributed
    from retinanet_tpu.parallel.mesh import shard_batch

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    host = (rng.randn(8, 3).astype(np.float32),
            rng.randint(0, 5, (8, 2)).astype(np.int32))
    a = distributed.global_batch_from_local(host, mesh)
    b = shard_batch(host, mesh)
    for x, y in zip(a, b):
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_data_parallel_inference_matches_single_device():
    """Data-parallel serving (make_inference_fn(mesh=...)): params
    replicated, batch sharded 8-way — VALID detections must match the
    single-device program (decode/NMS are per-image; no collectives).
    Padding slots are implementation-defined and excluded: the per-shard
    program compiles at batch 1, so XLA's conv tilings differ from the
    batch-8 program by float ulps, which scrambles garbage rows only."""
    from retinanet_tpu.config import NMSConfig
    from retinanet_tpu.infer import make_inference_fn

    cfg = Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=8),
        # Random-init class probs sit near the pi=0.01 prior; drop the
        # decode threshold so every image yields real detections.
        nms=NMSConfig(score_threshold=0.005),
    )
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    images = np.random.RandomState(1).randn(8, 64, 64, 3).astype(np.float32)

    single = make_inference_fn(model, levels, cfg)(params, images)
    mesh = make_mesh()
    sharded_fn = make_inference_fn(model, levels, cfg, mesh=mesh)
    sharded = sharded_fn(params, jnp.asarray(images))

    assert sharded.boxes.sharding.spec == batch_sharding(mesh).spec
    total = 0
    for i in range(8):
        v1 = np.asarray(single.valid[i])
        v2 = np.asarray(sharded.valid[i])
        assert v1.sum() == v2.sum(), f"image {i} detection count"
        total += int(v1.sum())
        for field, tol in (("scores", 1e-5), ("boxes", 1e-4),
                           ("class_ids", 0)):
            a = np.asarray(getattr(single, field)[i])[v1]
            b = np.asarray(getattr(sharded, field)[i])[v2]
            np.testing.assert_allclose(a, b, atol=tol,
                                       err_msg=f"image {i} {field}")
    assert total > 0, "test vacuous: no valid detections"


def test_data_parallel_fused_blocks_compose():
    """Fused whole-bottleneck Pallas serving kernels under a data-parallel
    mesh: the sharded program must run and emit batch-sharded outputs
    (smoke — on CPU the kernel runs through the Pallas interpreter, so
    this checks GSPMD composition, not TPU partitioning of the Mosaic
    custom call; that path is single-chip-only in this environment)."""
    from retinanet_tpu.infer import make_inference_fn

    cfg = Config(
        model=ModelConfig(backbone="resnet_50_dense", num_classes=3,
                          dropout_rate=0.0, fused_blocks=True,
                          fused_res2=True, fused_res2_strips=4),
        data=DataConfig(image_size=32, batch_size=8),
    )
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
                        training=False)["params"]
    images = np.random.RandomState(1).randn(8, 32, 32, 3).astype(np.float32)
    mesh = make_mesh()
    out = make_inference_fn(model, levels, cfg, mesh=mesh)(
        params, jnp.asarray(images))
    assert out.boxes.sharding.spec == batch_sharding(mesh).spec
    assert out.boxes.shape[0] == 8


def test_spatial_mesh_helpers():
    from retinanet_tpu.config import ParallelConfig
    from retinanet_tpu.parallel.mesh import image_sharding

    mesh = make_mesh(ParallelConfig(spatial=2))
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2
    from jax.sharding import PartitionSpec as P
    assert image_sharding(mesh).spec == P("data", "space")
    assert batch_sharding(mesh).spec == P("data")
    # 1-D mesh: image sharding degenerates to batch sharding.
    mesh1 = make_mesh()
    assert image_sharding(mesh1).spec == batch_sharding(mesh1).spec
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(ParallelConfig(spatial=3))


def test_spatial_train_step_matches_single_device(tmp_path):
    """dp x sp (4 x 2) GSPMD-spatially-partitioned train step == the
    single-device step: XLA's halo exchanges + cross-band reductions must
    be numerically transparent."""
    from retinanet_tpu.config import ParallelConfig
    from retinanet_tpu.parallel.mesh import image_sharding

    cfg = _cfg(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)

    np_rng = np.random.RandomState(0)
    images, boxes, ids, mask = _batch(np_rng, 8, 64, 8)
    images += np_rng.randn(*images.shape).astype(np.float32) * 0.1
    rng = jax.random.PRNGKey(5)

    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s1, m1 = jax.jit(make_train_step(model, levels, cfg))(
        state0, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(ids),
        jnp.asarray(mask), rng)

    mesh = make_mesh(ParallelConfig(spatial=2))
    repl, data_sh = replicated(mesh), batch_sharding(mesh)
    img_sh = image_sharding(mesh)
    step = jax.jit(
        make_train_step(model, levels, cfg),
        in_shardings=(repl, img_sh, data_sh, data_sh, data_sh, repl),
        out_shardings=(repl, repl))
    state0b = jax.device_put(
        create_train_state(model, cfg, jax.random.PRNGKey(0)), repl)
    s8, m8 = step(state0b,
                  jax.device_put(jnp.asarray(images), img_sh),
                  jax.device_put(jnp.asarray(boxes), data_sh),
                  jax.device_put(jnp.asarray(ids), data_sh),
                  jax.device_put(jnp.asarray(mask), data_sh),
                  jax.device_put(rng, repl))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m8["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatial_inference_matches_single_device(tmp_path):
    """Spatially-partitioned serving program == single-device detections."""
    from retinanet_tpu.config import NMSConfig, ParallelConfig
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.parallel.mesh import image_sharding

    cfg = Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=8),
        nms=NMSConfig(score_threshold=0.005),
    )
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    images = np.random.RandomState(1).randn(8, 64, 64, 3).astype(np.float32)

    single = make_inference_fn(model, levels, cfg)(params, images)
    mesh = make_mesh(ParallelConfig(spatial=2))
    sharded = make_inference_fn(model, levels, cfg, mesh=mesh)(
        params, jax.device_put(jnp.asarray(images), image_sharding(mesh)))

    total = 0
    for i in range(8):
        v1 = np.asarray(single.valid[i])
        v2 = np.asarray(sharded.valid[i])
        assert v1.sum() == v2.sum(), f"image {i} detection count"
        total += int(v1.sum())
        for field, tol in (("scores", 1e-5), ("boxes", 1e-4),
                           ("class_ids", 0)):
            a = np.asarray(getattr(single, field)[i])[v1]
            b = np.asarray(getattr(sharded, field)[i])[v2]
            np.testing.assert_allclose(a, b, atol=tol,
                                       err_msg=f"image {i} {field}")
    assert total > 0, "test vacuous: no valid detections"


def test_spatial_trainer_guards(tmp_path):
    """Trainer geometry validation for spatial partitioning."""
    import dataclasses

    import pytest

    from retinanet_tpu.config import ParallelConfig
    from retinanet_tpu.data.loaders.shapes import Shapes
    from retinanet_tpu.train import Trainer

    loader = Shapes(None, 8, (64, 64))
    base = _cfg(tmp_path)
    # Canvas height 60 not divisible by spatial=8.
    bad_h = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, image_size=60, batch_size=8),
        parallel=ParallelConfig(spatial=8))
    with pytest.raises(ValueError, match="canvas height"):
        Trainer(bad_h, loader)
    # Batch 3 not divisible by the 4-device data axis.
    bad_b = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, batch_size=3),
        parallel=ParallelConfig(spatial=2))
    with pytest.raises(ValueError, match="not divisible by the"):
        Trainer(bad_b, loader)


def test_detector_mesh_batch_divisibility_check():
    import pytest

    from retinanet_tpu.infer import Detector

    cfg = Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=6),  # 6 % 8 != 0
    )
    mesh = make_mesh()
    with pytest.raises(ValueError, match="divisible"):
        Detector(cfg, params=None, class_names=["a", "b", "c"], mesh=mesh)
