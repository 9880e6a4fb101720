"""Real multi-process distributed training test.

Spawns two OS processes, each with 4 virtual CPU devices, joined through
``jax.distributed.initialize`` into one 8-device cluster; each process feeds
its shard of the dataset (``shard_loader``) and its slice of the global
batch, and the Trainer assembles global arrays via
``jax.make_array_from_process_local_data``.  This is the end-to-end
validation of the multi-host input path the reference never had (its
MirroredStrategy was single-host and untested; SURVEY §5).
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid,
                           local_device_ids=list(range(4)))
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

sys.path.insert(0, os.getcwd())
from retinanet_tpu.config import (AssignConfig, Config, DataConfig,
                                  ModelConfig, ParallelConfig, TrainConfig)
from retinanet_tpu.data.loaders.shapes import Shapes
from retinanet_tpu.train import Trainer

use_buckets = sys.argv[4] == "buckets"
# Spatial x multi-process: 2-D (data=4, space=2) mesh across the two
# processes; the space axis tiles within each process's 4 local devices,
# so halo exchanges stay process-local and every process still feeds
# full-height image shards of its batch slice.
spatial = 2 if sys.argv[4] == "spatial" else 1
# Bucketed multi-process training rides the pipeline's deterministic canvas
# schedule (data/pipeline.py:_scheduled_batches): batch t's canvas is drawn
# from shared (train.seed, epoch) state, so both processes assemble the
# same global shape at every step.
cfg = Config(
    model=ModelConfig(backbone="mobilenet_v2", num_classes=3,
                      dropout_rate=0.0, compute_dtype="float32"),
    data=DataConfig(dataset=("shapes", "unused", "16", "64"), image_size=64,
                    batch_size=8, shuffle_buffer=1, num_workers=2,
                    augment_flip=False,
                    buckets=((64, 64), (64, 32)) if use_buckets else ()),
    assign=AssignConfig(max_boxes=8),
    train=TrainConfig(experiment=sys.argv[3], epochs=1, steps_per_epoch=2,
                      checkpoint_every=1000, log_every=1,
                      learning_rate=1e-3),
    parallel=ParallelConfig(spatial=spatial),
)
loader = Shapes(None, 16, (64, 64))
trainer = Trainer(cfg, loader=loader)
assert trainer.num_processes == 2
assert trainer.pipeline.config.batch_size == 4  # local slice of global 8
assert trainer.pipeline.scheduled_canvases == use_buckets
assert dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)) == (
    {"data": 4, "space": 2} if spatial == 2 else {"data": 8})
assert trainer.is_lead == (pid == 0)
state = trainer.fit()
assert trainer.latest_checkpoint_step() == 2
print("FINAL_STEP", int(state.step), "LOSS_OK", flush=True)

if sys.argv[4] == "square":
    # Multi-process evaluation: each process detects its round-robin shard,
    # records are all-gathered, and EVERY process must compute identical
    # metrics (evaluate_model replays records in global dataset order).
    import json
    from retinanet_tpu import evaluate as eval_cli
    base = ["--dataset", "shapes", "unused", "16", "64",
            "--experiment", sys.argv[3], "--backbone", "mobilenet_v2",
            "--scale", "64", "--batch-size", "4", "--platform", "cpu"]
    metrics = eval_cli.main(base)
    print("EVAL_METRICS", json.dumps(metrics, sort_keys=True), flush=True)
    # --data-parallel under multi-process: each process shards its eval
    # batches over its OWN 4 local devices (local mesh), detection stays
    # collective-free, and the final record all-gather is unchanged.
    # (Bit-equality with the non-DP run is NOT promised — per-shard
    # programs compile at batch 1 and differ from the batch-4 program by
    # conv-tiling ulps — but cross-process identity still is.)
    metrics_dp = eval_cli.main(base + ["--data-parallel"])
    print("EVAL_METRICS_DP", json.dumps(metrics_dp, sort_keys=True),
          flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import pytest


@pytest.mark.parametrize("mode", ["square", "buckets", "spatial"])
def test_two_process_distributed_training(tmp_path, mode):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # One SHARED experiment dir: multihost Orbax saves are coordinated
    # barriers across processes against the same directory.
    exp = str(tmp_path / "exp")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid), exp,
             mode],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "FINAL_STEP 2" in out, out[-2000:]
    if mode == "square":
        # Sharded multi-process eval must yield IDENTICAL metrics on every
        # process (records replayed in global order after the all-gather)
        # — for the plain path AND the per-process data-parallel path.
        for tag in ("EVAL_METRICS ", "EVAL_METRICS_DP "):
            lines = [[ln for ln in out.splitlines() if ln.startswith(tag)]
                     for out in outs]
            assert all(len(ls) == 1 for ls in lines), outs[0][-2000:]
            assert lines[0][0] == lines[1][0], (lines[0][0], lines[1][0])
        lines = [[ln for ln in out.splitlines()
                  if ln.startswith("EVAL_METRICS ")] for out in outs]
        # ... and bit-identical to a single-process evaluation of the same
        # checkpoint (per-image detection is batch-composition-independent;
        # records replay in global dataset order).
        import json

        from retinanet_tpu import evaluate as eval_cli
        single = eval_cli.main([
            "--dataset", "shapes", "unused", "16", "64",
            "--experiment", exp, "--backbone", "mobilenet_v2",
            "--scale", "64", "--batch-size", "4", "--platform", "cpu"])
        expect = "EVAL_METRICS " + json.dumps(single, sort_keys=True)
        assert lines[0][0] == expect, (lines[0][0], expect)
