"""Multi-host initialization (SURVEY §5 distributed backend).

The reference is single-host only (MirroredStrategy, ``train.py:261-262``).
The TPU-native multi-host story: call :func:`initialize` once per process
(e.g. per TPU-pod worker); ``jax.devices()`` then spans the slice and the
same 1-D data mesh in ``parallel/mesh.py`` covers all chips — gradient
collectives ride ICI within a slice and DCN across slices, placed by XLA.

The host pipeline must then shard the *input*: each process feeds only its
addressable shard of the global batch (``process_batch_slice``), and
``jax.make_array_from_process_local_data`` assembles the global array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper; no-op for single-process runs
    (auto-detects TPU pod environments when args are None)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of the global batch."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    return i * per, per


class _LoaderShard:
    """View of a loader restricted to samples ``i % num_shards == shard``.

    Keeps the loader interface (``class_names`` / ``num_classes`` /
    ``__iter__`` / ``__len__``) so the pipeline is shard-agnostic; every
    process iterates a disjoint subset, together covering the dataset.
    """

    def __init__(self, loader, shard: int, num_shards: int):
        self.loader = loader
        self.shard = shard
        self.num_shards = num_shards
        self.class_names = loader.class_names
        self.num_classes = loader.num_classes

    def __len__(self) -> int:
        n, s = len(self.loader), self.num_shards
        return n // s + (1 if n % s > self.shard else 0)

    def __iter__(self):
        for i, sample in enumerate(self.loader):
            if i % self.num_shards == self.shard:
                yield sample


def shard_loader(loader, shard: int, num_shards: int):
    """Per-process dataset shard for multi-host input (each process feeds
    only its slice of the global batch)."""
    if num_shards <= 1:
        return loader
    if not 0 <= shard < num_shards:
        raise ValueError(f"shard {shard} out of range [0, {num_shards})")
    return _LoaderShard(loader, shard, num_shards)


def allgather_pyobjs(obj):
    """All-gather one picklable host object per process; every process
    returns the list ``[obj_from_process_0, ..., obj_from_process_{n-1}]``
    (identity for single-process runs).

    Objects are pickled and exchanged as max-length-padded uint8 arrays via
    ``multihost_utils.process_allgather`` (two collectives: lengths, then
    payloads).  Host metadata only — e.g. the distributed evaluator's
    per-image detection records — never hot-path tensors.

    Trusted-environment-only: payloads are unpickled, so every process in
    the pod must be mutually trusted (true of any jax.distributed job —
    processes already share a coordinator and device mesh).
    """
    import pickle

    n = jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(data)], np.int64))).reshape(n)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [pickle.loads(gathered[i, :int(lens[i])].tobytes())
            for i in range(n)]


def global_batch_from_local(local_arrays, mesh, shardings=None) -> "jax.Array":
    """Assemble per-process local batch shards into one global jax.Array
    sharded on the mesh's data axis.

    ``shardings``: optional pytree of per-leaf NamedShardings (matching
    ``local_arrays``) overriding the default batch sharding — used by the
    spatially-partitioned trainer to put images on the ``(data, space)``
    mesh while labels stay batch-sharded.
    """
    from retinanet_tpu.parallel.mesh import batch_sharding

    default = batch_sharding(mesh)
    if shardings is None:
        shardings = jax.tree_util.tree_map(lambda _: default, local_arrays)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)), local_arrays, shardings)
