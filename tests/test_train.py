"""Trainer tests: single-step convergence machinery, checkpoint/resume, and
multi-device DP on the virtual 8-device CPU mesh (the testing the reference
never had — MirroredStrategy is completely untested there; SURVEY §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.config import (
    AssignConfig, Config, DataConfig, ModelConfig, TrainConfig)
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.train import (
    TrainState, Trainer, build_optimizer, create_train_state, make_train_step)
from retinanet_tpu.ops.anchors import build_levels
from retinanet_tpu.models.retinanet import RetinaNet
from retinanet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch)


def _tiny_config(tmp_path, batch_size=2, image_size=64, **train_kw):
    return Config(
        model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                          dropout_rate=0.0, compute_dtype="float32"),
        data=DataConfig(dataset=("shapes", "unused", "8", str(image_size)),
                        image_size=image_size, batch_size=batch_size,
                        shuffle_buffer=4, num_workers=2),
        assign=AssignConfig(max_boxes=8),
        train=TrainConfig(experiment=str(tmp_path), epochs=1,
                          checkpoint_every=1000, log_every=1,
                          learning_rate=1e-2, **train_kw),
    )


def _random_batch(rng, batch, size, max_boxes):
    images = rng.randn(batch, size, size, 3).astype(np.float32)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    ids = np.zeros((batch, max_boxes), np.int32)
    mask = np.zeros((batch, max_boxes), bool)
    mask[:, 0] = True
    return images, boxes, ids, mask


def test_build_optimizer_variants():
    for name in ("momentum", "adam", "rmsprop"):
        tx = build_optimizer(TrainConfig(optimizer=name))
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert updates["w"].shape == (3,)
    tx = build_optimizer(TrainConfig(grad_clip_norm=1.0))
    state = tx.init({"w": jnp.ones(3)})
    updates, _ = tx.update({"w": jnp.ones(3) * 100}, state, {"w": jnp.ones(3)})
    # clipped: global norm of update pre-lr is 1 → lr*1e-2 scale
    assert float(jnp.abs(updates["w"]).max()) < 1.0


def test_train_step_decreases_loss(tmp_path):
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng)
    step_fn = jax.jit(make_train_step(model, levels, cfg))

    np_rng = np.random.RandomState(0)
    images, boxes, ids, mask = _random_batch(np_rng, 2, 64, 8)
    args = tuple(jnp.asarray(x) for x in (images, boxes, ids, mask))

    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, *args, jax.random.PRNGKey(1))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    # Overfitting a fixed batch: loss must drop substantially.
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_train_step_metrics_keys(tmp_path):
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, levels, cfg))
    np_rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(x) for x in _random_batch(np_rng, 2, 64, 8))
    _, metrics = step_fn(state, *args, jax.random.PRNGKey(1))
    for key in ("total_loss", "class_loss", "regr_loss",
                "regularization_loss", "grad_norm", "class_iou", "regr_iou",
                "num_fg", "prob_fg_hist", "prob_bg_hist"):
        assert key in metrics, key
    assert metrics["prob_fg_hist"].shape == (20,)
    assert int(metrics["num_fg"]) > 0


def test_light_step_matches_full_step(tmp_path):
    """with_metrics=False must produce identical state updates — it only
    drops the diagnostic reductions from the metrics dict."""
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    np_rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(x) for x in _random_batch(np_rng, 2, 64, 8))
    rng = jax.random.PRNGKey(1)

    s_full = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s_light = create_train_state(model, cfg, jax.random.PRNGKey(0))
    full = jax.jit(make_train_step(model, levels, cfg, with_metrics=True))
    light = jax.jit(make_train_step(model, levels, cfg, with_metrics=False))
    s_full, m_full = full(s_full, *args, rng)
    s_light, m_light = light(s_light, *args, rng)

    assert "prob_fg_hist" in m_full and "class_iou" in m_full
    assert "prob_fg_hist" not in m_light and "class_iou" not in m_light
    assert "total_loss" in m_light and "grad_norm" in m_light
    np.testing.assert_allclose(float(m_full["total_loss"]),
                               float(m_light["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_light.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_retention(tmp_path):
    """Only the newest keep_checkpoints survive (reference Estimator kept
    5 by default; round-1 kept everything)."""
    import dataclasses
    cfg = _tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, keep_checkpoints=2))
    loader = Shapes(None, 4, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    state = create_train_state(trainer.model, cfg, jax.random.PRNGKey(0))
    for step in (1, 2, 3, 4):
        s = TrainState(jnp.asarray(step), state.params, state.opt_state)
        trainer.save_checkpoint(s)
        trainer.wait_for_checkpoints()
    names = sorted(os.listdir(trainer.checkpoint_dir))
    assert names == ["step_3", "step_4"]
    # Restore still works from the newest.
    restored = trainer.restore_checkpoint(state)
    assert int(restored.step) == 4


def test_dp_mesh_matches_single_device(tmp_path):
    """8-way sharded step produces the same loss/params as unsharded."""
    cfg = _tiny_config(tmp_path, batch_size=8)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, levels, cfg)

    np_rng = np.random.RandomState(1)
    images, boxes, ids, mask = _random_batch(np_rng, 8, 64, 8)
    images += np_rng.randn(*images.shape).astype(np.float32) * 0.1
    rng = jax.random.PRNGKey(2)

    # Single device reference.
    s1, m1 = jax.jit(step)(state0, jnp.asarray(images), jnp.asarray(boxes),
                           jnp.asarray(ids), jnp.asarray(mask), rng)

    # 8-device mesh.
    mesh = make_mesh()
    assert mesh.devices.size == 8
    repl, data_sh = replicated(mesh), batch_sharding(mesh)
    jitted = jax.jit(step,
                     in_shardings=(repl, data_sh, data_sh, data_sh, data_sh,
                                   repl),
                     out_shardings=(repl, repl))
    state0_r = jax.device_put(
        create_train_state(model, cfg, jax.random.PRNGKey(0)), repl)
    db = shard_batch((images, boxes, ids, mask), mesh)
    s8, m8 = jitted(state0_r, *db, jax.device_put(rng, repl))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    # Updated params identical up to float tolerance.
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_focal_loss_decreases(tmp_path):
    """Focal loss — implemented-but-disabled in the reference because it
    wouldn't train at batch 1 (README.md:3-15) — must optimize here."""
    from retinanet_tpu.config import LossConfig
    import dataclasses
    cfg = _tiny_config(tmp_path)
    cfg = dataclasses.replace(cfg, loss=LossConfig(class_losses=("focal",)))
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, levels, cfg))
    np_rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(x) for x in _random_batch(np_rng, 2, 64, 8))
    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, *args, jax.random.PRNGKey(1))
        losses.append(float(metrics["class_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_remat_matches_no_remat(tmp_path):
    """Per-block remat must not change numerics, only memory/compute."""
    import dataclasses
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    np_rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(x) for x in _random_batch(np_rng, 2, 64, 8))
    rng = jax.random.PRNGKey(3)

    results = []
    for remat in (False, True):
        mcfg = dataclasses.replace(cfg.model, remat=remat)
        c = dataclasses.replace(cfg, model=mcfg)
        model = RetinaNet.from_config(c.model,
                                      num_anchors=levels.num_anchors)
        state = create_train_state(model, c, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, levels, c))
        state, metrics = step(state, *args, rng)
        results.append((state, metrics))

    (s0, m0), (s1, m1) = results
    np.testing.assert_allclose(float(m0["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_write_image_summaries(tmp_path):
    from retinanet_tpu.data.pipeline import Batch
    cfg = _tiny_config(tmp_path)
    loader = Shapes(None, 4, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    state = create_train_state(trainer.model, cfg, jax.random.PRNGKey(0))
    state = TrainState(jnp.asarray(7), state.params, state.opt_state)

    rng = np.random.RandomState(0)
    batch = Batch(
        images=rng.randn(2, 64, 64, 3).astype(np.float32),
        boxes=np.tile(np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32),
                      (2, 8, 1)),
        class_ids=np.zeros((2, 8), np.int32),
        box_mask=np.tile(np.asarray([[True] + [False] * 7]), (2, 1)),
        image_ids=np.arange(2),
        scales=np.ones(2, np.float32),
    )
    trainer.write_image_summaries(state, batch)
    out_dir = os.path.join(str(tmp_path), "summaries", "step_7")
    files = sorted(os.listdir(out_dir))
    assert "0_true.png" in files and "0_pred.png" in files
    # Per-level classmap heat overlays (reference train.py:52-66,176-187).
    assert "0_classmap_P3_true.png" in files
    assert "0_classmap_P3_pred.png" in files
    assert "1_classmap_P7_true.png" in files


@pytest.mark.slow
def test_trainer_end_to_end_with_checkpoint(tmp_path):
    cfg = _tiny_config(tmp_path)
    loader = Shapes(None, 8, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    state = trainer.fit(epochs=1, steps_per_epoch=2)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))
    assert trainer.latest_checkpoint_step() == 2

    # Resume: a fresh trainer restores step 2 and continues to 4.
    trainer2 = Trainer(cfg, loader=loader)
    state2 = trainer2.fit(epochs=1, steps_per_epoch=2)
    assert int(state2.step) == 4


def test_trainer_init_backbone_applies_import(tmp_path):
    """--init-backbone through the Trainer: a fresh fit() must import the
    backbone weights before step 0 (regression: state._replace was
    mistyped as state.replace and only this code path executed it)."""
    from retinanet_tpu.utils.pretrained import save_backbone

    cfg = _tiny_config(tmp_path / "donor")
    loader = Shapes(None, 8, (64, 64))
    donor = Trainer(cfg, loader=loader)
    donor_state = donor.fit(epochs=1, steps_per_epoch=1)
    npz = str(tmp_path / "backbone.npz")
    save_backbone(jax.device_get(donor_state.params), npz)

    cfg2 = _tiny_config(tmp_path / "fresh", init_backbone=npz)
    trainee = Trainer(cfg2, loader=loader)
    state = trainee.fit(epochs=1, steps_per_epoch=1)
    assert int(state.step) == 1
    # The run trained for one step *from* the imported backbone; it must
    # have produced a checkpoint (i.e. fit() survived the import path).
    assert trainee.latest_checkpoint_step() == 1


def test_train_step_rect_canvas(tmp_path):
    """One train step on a rectangular (64x32) bucket batch: same step
    function, one compiled program per canvas shape."""
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, levels, cfg,
                                      with_metrics=True))
    np_rng = np.random.RandomState(0)
    images = np_rng.randn(2, 64, 32, 3).astype(np.float32)
    boxes = np.zeros((2, 8, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    ids = np.zeros((2, 8), np.int32)
    mask = np.zeros((2, 8), bool)
    mask[:, 0] = True
    state, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(boxes),
                             jnp.asarray(ids), jnp.asarray(mask),
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["regr_iou"]) >= 0.0

    # Structural check: per-level label grids follow the rectangular canvas
    # (ceil(h/2^k), ceil(w/2^k)) per dimension.
    from retinanet_tpu.ops import assign
    cls_t, _, _ = assign.build_labels(
        jnp.asarray(boxes[0]), jnp.asarray(ids[0]), jnp.asarray(mask[0]),
        (64, 32), levels, 3)
    assert cls_t["P3"].shape[:2] == (8, 4)
    assert cls_t["P5"].shape[:2] == (2, 1)
    assert cls_t["P7"].shape[:2] == (1, 1)


def test_inference_rect_canvas(tmp_path):
    """Decode path on a rectangular canvas: boxes stay in [0,1]^2 with
    per-dimension normalization."""
    from retinanet_tpu.infer import make_inference_fn
    import dataclasses
    cfg = _tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, nms=dataclasses.replace(cfg.nms, use_pallas=False,
                                     top_k_per_level=20, pre_nms_top_k=40,
                                     max_output_size=10,
                                     score_threshold=0.0))
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        training=False)["params"]
    fn = make_inference_fn(model, levels, cfg, use_pallas=False)
    out = fn(params, jnp.zeros((2, 64, 32, 3)))
    assert out.boxes.shape == (2, 10, 4)
    b = np.asarray(out.boxes)
    assert np.isfinite(b).all()


def test_uint8_batch_matches_float_batch(tmp_path):
    """On-device normalization of a uint8 batch gives the same step result
    as the pre-normalized float batch."""
    cfg = _tiny_config(tmp_path)
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    step = jax.jit(make_train_step(model, levels, cfg, with_metrics=False))

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    mean = np.asarray(cfg.data.mean, np.float32)
    std = np.asarray(cfg.data.std, np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    boxes = np.zeros((2, 8, 4), np.float32)
    boxes[:, 0] = [0.2, 0.2, 0.7, 0.7]
    ids = np.zeros((2, 8), np.int32)
    mask = np.zeros((2, 8), bool)
    mask[:, 0] = True
    args = (jnp.asarray(boxes), jnp.asarray(ids), jnp.asarray(mask),
            jax.random.PRNGKey(1))

    s0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s1 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_u8 = step(s0, jnp.asarray(u8), *args)
    _, m_f32 = step(s1, jnp.asarray(f32), *args)
    np.testing.assert_allclose(float(m_u8["total_loss"]),
                               float(m_f32["total_loss"]), rtol=1e-5)


def test_train_step_rejects_int8_quantize(tmp_path):
    """int8 is serving-only: quantized convs have zero gradients, so
    training with model.quantize='int8' must fail loudly (advisor r2)."""
    import dataclasses
    cfg = _tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="int8"))
    levels = build_levels(cfg.anchors)
    model = RetinaNet.from_config(cfg.model, num_anchors=levels.num_anchors)
    with pytest.raises(ValueError, match="serving-only"):
        make_train_step(model, levels, cfg)


def test_multiprocess_guards(tmp_path, monkeypatch):
    """Multi-host Trainer: buckets are rejected, and per-epoch step counts
    are synchronized to the smallest shard (advisor r2 deadlock finding)."""
    import dataclasses
    from retinanet_tpu.data.loaders.shapes import Shapes

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    cfg = _tiny_config(tmp_path, batch_size=8)
    bucket_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      buckets=((64, 64), (64, 32))))
    # Round 4: buckets x multi-process is now a capability, not a guard —
    # the pipeline runs its deterministic canvas schedule so every process
    # assembles the same global shape at each step.
    bt = Trainer(bucket_cfg, loader=Shapes(None, 10, (64, 64)))
    assert bt.pipeline.scheduled_canvases
    assert bt.pipeline.schedule_seed == bucket_cfg.train.seed

    # 19 samples / 2 processes -> shards of 10 and 9; local batch 4 ->
    # guaranteed minimum (19 // 2) // 4 = 2 steps per epoch on EVERY process.
    trainer = Trainer(cfg, loader=Shapes(None, 19, (64, 64)))
    assert trainer._sync_steps_per_epoch == 2


def test_benchmark_train_pipeline_runs(tmp_path):
    """Live-pipeline train bench (host decode + uint8 transfer overlapped)
    produces a sane throughput record on CPU."""
    from retinanet_tpu.train import benchmark_train_pipeline
    cfg = _tiny_config(tmp_path)
    out = benchmark_train_pipeline(cfg, batch_size=2, steps=2, warmup=1,
                                   num_classes=4, num_images=12)
    assert out["images_per_sec"] > 0
    assert out["batch_size"] == 2


def test_profile_steps_writes_trace(tmp_path):
    """--profile N (train.profile_steps): a jax.profiler trace of the hot
    steps lands under <experiment>/profile."""
    cfg = _tiny_config(tmp_path, profile_steps=2)
    loader = Shapes(None, 16, (64, 64))
    Trainer(cfg, loader=loader).fit(epochs=1, steps_per_epoch=6)

    prof = os.path.join(str(tmp_path), "profile")
    assert os.path.isdir(prof)
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs]
    assert any(f.endswith(".xplane.pb") or ".trace" in f for f in found), found


def test_training_is_seed_deterministic(tmp_path):
    """Two runs with identical config+seed produce bit-identical logged
    losses (seeded pipeline shuffle/flip, seeded init, seeded dropout rng)
    — the reproducibility contract the reference never had."""
    import json

    def run(d):
        cfg = _tiny_config(d)
        loader = Shapes(None, 8, (64, 64))
        Trainer(cfg, loader=loader).fit(epochs=1, steps_per_epoch=3)
        with open(os.path.join(str(d), "metrics.jsonl")) as f:
            return [json.loads(line)["total_loss"] for line in f
                    if "total_loss" in line]

    a = run(tmp_path / "a")
    b = run(tmp_path / "b")
    assert len(a) >= 2
    assert a == b  # bitwise: same program, same data order, same rng


def test_average_checkpoints_serves_param_mean(tmp_path):
    """evaluate --average-checkpoints N: the served params are the
    elementwise mean of the newest N checkpoints."""
    cfg = _tiny_config(tmp_path)
    loader = Shapes(None, 4, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    base = create_train_state(trainer.model, cfg, jax.random.PRNGKey(0))

    def scaled(state, f, step):
        params = jax.tree_util.tree_map(lambda x: x * f, state.params)
        return TrainState(jnp.asarray(step), params, state.opt_state)

    trainer.save_checkpoint(scaled(base, 1.0, 1))
    trainer.save_checkpoint(scaled(base, 3.0, 2))
    trainer.wait_for_checkpoints()

    from retinanet_tpu.evaluate import load_detector
    det = load_detector(cfg, loader, average_last=2)
    # mean of 1x and 3x = 2x the base params.
    for a, b in zip(jax.tree_util.tree_leaves(det.params),
                    jax.tree_util.tree_leaves(base.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) * 2.0,
                                   atol=1e-6)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mutually exclusive"):
        load_detector(cfg, loader, step=1, average_last=2)


def test_steps_per_epoch_does_not_leak_pipeline_threads(tmp_path):
    """--steps-per-epoch breaks out of each epoch's batch stream mid-
    pipeline; the abandoned producer + worker-pool threads (and the
    batches they hold) must be torn down deterministically.  Round-5
    incident: 5 leaked threads and ~1 retained batch PER EPOCH grew a
    2400-step @b128 run to 130 GB host RSS and the OOM killer ended it
    at step 824 (reproduced + tracemalloc'd on CPU; fixed in
    Pipeline.prefetched/_bounded_map + Trainer.fit's closing())."""
    import threading
    cfg = _tiny_config(tmp_path)
    loader = Shapes(None, 16, (64, 64))
    trainer = Trainer(cfg, loader=loader)
    trainer.fit(epochs=2, steps_per_epoch=1)  # warm jit + orbax threads
    before = threading.active_count()
    trainer.fit(epochs=6, steps_per_epoch=1)
    after = threading.active_count()
    # pre-fix this leaked 5 threads per epoch (30 here); allow slack for
    # transient jax/orbax internals.
    assert after <= before + 3, (before, after)


def test_serving_restore_ignores_optimizer_structure(tmp_path):
    """Serving restore must not depend on the TRAINING-time optimizer
    config: --grad-clip-norm adds a clip element to the optax chain, which
    changes the checkpoint's opt_state pytree structure — a full-tree
    restore from an eval-side template then fails the structure match
    (round-5 bug, hit by evaluating the focal+clip run).  evaluate/export/
    detect now restore the params subtree only."""
    import dataclasses
    cfg = _tiny_config(tmp_path)
    clip_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_clip_norm=1.0))
    loader = Shapes(None, 4, (64, 64))
    trainer = Trainer(clip_cfg, loader=loader)
    state = create_train_state(trainer.model, clip_cfg,
                               jax.random.PRNGKey(0))
    state = TrainState(jnp.asarray(1), state.params, state.opt_state)
    trainer.save_checkpoint(state)
    trainer.wait_for_checkpoints()

    # The serving config knows nothing of the clip; restore must succeed
    # and hand back exactly the saved params.
    from retinanet_tpu.evaluate import load_detector
    det = load_detector(cfg, loader)
    for a, b in zip(jax.tree_util.tree_leaves(det.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_accum_duplicated_batch_matches_plain(tmp_path):
    """grad_accum=2 on a duplicated batch [b; b] must land on exactly the
    params of a plain step on b: the two micro-gradients are identical, so
    their mean is the plain gradient — catches sum-vs-mean and micro-batch
    slicing bugs in the lax.scan accumulation path."""
    import dataclasses

    cfg1 = _tiny_config(tmp_path, batch_size=2)
    cfg2 = dataclasses.replace(
        cfg1,
        data=dataclasses.replace(cfg1.data, batch_size=4),
        train=dataclasses.replace(cfg1.train, grad_accum=2))

    levels = build_levels(cfg1.anchors)
    model = RetinaNet.from_config(cfg1.model, num_anchors=levels.num_anchors)
    np_rng = np.random.RandomState(0)
    images, boxes, ids, mask = _random_batch(np_rng, 2, 64, 8)
    images += np_rng.randn(*images.shape).astype(np.float32) * 0.1
    dup = lambda x: np.concatenate([x, x], axis=0)
    rng = jax.random.PRNGKey(7)

    s1, m1 = jax.jit(make_train_step(model, levels, cfg1))(
        create_train_state(model, cfg1, jax.random.PRNGKey(0)),
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(ids),
        jnp.asarray(mask), rng)
    s2, m2 = jax.jit(make_train_step(model, levels, cfg2))(
        create_train_state(model, cfg2, jax.random.PRNGKey(0)),
        jnp.asarray(dup(images)), jnp.asarray(dup(boxes)),
        jnp.asarray(dup(ids)), jnp.asarray(dup(mask)), rng)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Sum-form metrics double on the duplicated batch.
    assert int(m2["num_fg"]) == 2 * int(m1["num_fg"])


def test_grad_accum_metric_sums_are_batch_split_invariant(tmp_path):
    """Diagnostics are accumulated in sum-form across micro-batches: on the
    SAME batch, accum=4 must reproduce accum=1's full-batch num_fg,
    histograms, and IoU ratios exactly (the model is per-sample — GroupNorm,
    no batch coupling — so per-image outputs are split-invariant)."""
    import dataclasses

    cfg1 = _tiny_config(tmp_path, batch_size=4)
    cfg4 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, grad_accum=4))

    levels = build_levels(cfg1.anchors)
    model = RetinaNet.from_config(cfg1.model, num_anchors=levels.num_anchors)
    np_rng = np.random.RandomState(1)
    images, boxes, ids, mask = _random_batch(np_rng, 4, 64, 8)
    images += np_rng.randn(*images.shape).astype(np.float32) * 0.1
    args = tuple(jnp.asarray(x) for x in (images, boxes, ids, mask))
    state0 = create_train_state(model, cfg1, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)

    _, m1 = jax.jit(make_train_step(model, levels, cfg1))(state0, *args, rng)
    state0 = create_train_state(model, cfg4, jax.random.PRNGKey(0))
    _, m4 = jax.jit(make_train_step(model, levels, cfg4))(state0, *args, rng)

    assert int(m1["num_fg"]) == int(m4["num_fg"])
    for key, tol in (("prob_fg_hist", 1e-4), ("prob_bg_hist", 1e-3),
                     ("class_iou", 1e-5), ("regr_iou", 1e-5),
                     ("regularization_loss", 1e-6)):
        np.testing.assert_allclose(np.asarray(m1[key]), np.asarray(m4[key]),
                                   rtol=tol, err_msg=key)
    # Loss scalars legitimately differ (per-micro-batch normalizers) but
    # must stay in the same ballpark.
    assert abs(float(m1["total_loss"]) - float(m4["total_loss"])) < 0.5


def test_grad_accum_guards(tmp_path):
    """batch %% grad_accum is validated in the Trainer and the CLI wires
    --grad-accum into TrainConfig."""
    import dataclasses

    from retinanet_tpu.config import config_from_args
    from retinanet_tpu.data.loaders.shapes import Shapes

    cfg = _tiny_config(tmp_path, batch_size=3, grad_accum=2)
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg, loader=Shapes(None, 8, (64, 64)))

    parsed = config_from_args([
        "--dataset", "shapes", "x", "8", "64", "--experiment",
        str(tmp_path), "--grad-accum", "4", "--batch-size", "8"])
    assert parsed.train.grad_accum == 4
