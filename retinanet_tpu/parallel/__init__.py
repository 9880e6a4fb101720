"""Device-mesh parallelism: sharding specs and the DP train step plumbing."""

from retinanet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicated, shard_batch)
