"""Device mesh + sharding (replaces MirroredStrategy, reference
``train.py:261-262`` / ``utils.py:311-315``).

The reference's only strategy is single-host data parallelism with NCCL
all-reduce.  The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all
visible devices, batch dimension sharded along ``data``, parameters
replicated.  The train step is a plain ``jax.jit`` with NamedSharding
annotations — XLA's SPMD partitioner inserts the gradient all-reduce as ICI
collectives, and global-batch loss semantics (the reference's dice over the
whole flattened batch) fall out automatically because reductions over sharded
arrays are global under jit.

Model code never mentions the mesh: scaling to more chips (or adding a model
axis later) is a config change, per the mesh-agnostic design in SURVEY.md §5.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retinanet_tpu.config import ParallelConfig


def make_mesh(config: ParallelConfig = ParallelConfig(),
              devices=None) -> Mesh:
    """Data mesh over visible devices (auto-detect like the reference's
    ``get_num_gpus``; identical single-device behaviour).

    ``config.spatial > 1`` builds a 2-D ``(data, space)`` mesh instead:
    batch shards along ``data``, image height along ``space`` (GSPMD
    spatial partitioning — see :class:`ParallelConfig`).
    """
    if devices is None:
        devices = jax.devices()
    n = config.num_devices or len(devices)
    sp = config.spatial
    if sp > 1:
        if n % sp:
            raise ValueError(
                f"{n} devices not divisible by spatial={sp}")
        grid = np.asarray(devices[:n]).reshape(n // sp, sp)
        return Mesh(grid, (config.data_axis, config.space_axis))
    return Mesh(np.asarray(devices[:n]), (config.data_axis,))


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for image batches ``[B, H, W, 3]``: batch on the data axis,
    and — when the mesh has a space axis — height on the space axis.  XLA
    inserts conv halo exchanges between the height bands; model code is
    unchanged.  Identical to :func:`batch_sharding` on a 1-D mesh."""
    names = mesh.axis_names
    if len(names) > 1:
        return NamedSharding(mesh, P(names[0], names[1]))
    return NamedSharding(mesh, P(names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch pytree with the batch dim sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """device_put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def space_replicated_hint(mesh: Mesh):
    """Sharding hint for tensors the space axis cannot usefully shard
    (e.g. FPN P6/P7 feature maps — 1-4 pixels tall): batch on the data
    axis, replicated over space.  ``with_sharding_constraint`` also
    constrains the cotangent in the backward, which is the point — without
    it the partitioner bridges P6/P7's dgrad/wgrad layouts through an
    "involuntary full rematerialization" (MULTICHIP_r03 tail)."""
    n_data = mesh.shape[mesh.axis_names[0]]
    data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl_sh = NamedSharding(mesh, P())
    # Fully replicated when the batch dim can't shard (model.init traces
    # with a batch-1 dummy).
    return lambda x: jax.lax.with_sharding_constraint(
        x, data_sh if x.shape[0] % n_data == 0 else repl_sh)
