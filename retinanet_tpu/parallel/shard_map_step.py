"""Explicit-collective (shard_map) train step — the alternative parallel
backend to the jit+NamedSharding path in ``retinanet_tpu.train``.

Where the jit path lets XLA's SPMD partitioner place collectives, this one
spells them out: each device computes on its batch shard, the loss reductions
``psum`` their statistics over the data axis (``ops/losses.py`` takes
``axis_name``), so the global-batch loss semantics (dice over the whole
flattened batch, SUM_BY_NONZERO_WEIGHTS) are exact, and gradient cotangents
flow back through the psum transpose — no separate gradient all-reduce is
needed.  Verified bit-compatible with the single-device step in
``tests/test_parallel.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from retinanet_tpu.config import Config
from retinanet_tpu.models.retinanet import RetinaNet, l2_regularization
from retinanet_tpu.ops import assign
from retinanet_tpu.ops.anchors import Levels
from retinanet_tpu.ops.losses import detection_loss
from retinanet_tpu.utils.pytree import flatten_levels


def make_shard_map_train_step(model: RetinaNet, levels: Levels,
                              config: Config, mesh: Mesh):
    """Returns a jitted (state, images, boxes, class_ids, box_mask, rng) →
    (state, metrics) function running as shard_map over ``mesh``."""
    from retinanet_tpu.train import TrainState, build_optimizer

    axis = mesh.axis_names[0]
    num_classes = model.num_classes
    tx = build_optimizer(config.train)

    def local_step(state: TrainState, images: Array, boxes: Array,
                   class_ids: Array, box_mask: Array,
                   rng: Array) -> Tuple[TrainState, Dict[str, Array]]:
        from retinanet_tpu.ops.preprocess import maybe_normalize
        images = maybe_normalize(images, config.data)
        cls_t, regr_t, masks = assign.build_labels_batch(
            boxes, class_ids, box_mask, images.shape[1:3], levels,
            num_classes, config.assign)
        ct = flatten_levels(cls_t)
        rt = flatten_levels(regr_t)
        tm = flatten_levels(masks)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply({"params": params}, images, training=True,
                              rngs={"dropout": dropout_rng})
            cl = flatten_levels(out["classifications"])
            rg = flatten_levels(out["regressions"])
            class_loss, regr_loss = detection_loss(
                ct, cl, rt, rg, tm, config.loss, axis_name=axis)
            reg_loss = l2_regularization(params, model.backbone,
                                         config.loss.weight_decay)
            return class_loss + regr_loss + reg_loss, (class_loss, regr_loss,
                                                       reg_loss)

        (total, (class_loss, regr_loss, reg_loss)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # No explicit gradient all-reduce: with replication tracking on
        # (check_rep=True) the loss-internal psums transpose correctly and
        # the replicated params' gradient arrives complete on every shard.
        # (check_rep=False silently zeroes these cotangents, and an explicit
        # psum overcounts by the mesh size — verified 8-way vs single-device
        # in tests/test_parallel.py.)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "total_loss": total,
            "class_loss": class_loss,
            "regr_loss": regr_loss,
            "regularization_loss": reg_loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(state.step + 1, params, opt_state), metrics

    state_spec = P()  # replicated
    data_spec = P(axis)
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, data_spec, data_spec,
                  state_spec),
        out_specs=(state_spec, state_spec),
        check_rep=True)
    return jax.jit(mapped, donate_argnums=(0,))
