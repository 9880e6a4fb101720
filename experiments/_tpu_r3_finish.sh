#!/bin/bash
# Serialized round-3 TPU finishing runs (one TPU process at a time):
#   1. blockfuse A/B  (fused whole-bottleneck Pallas kernel vs XLA path)
#   2. trainsweep     (post-assignment-fix train throughput table)
#   3. bench.py       (final round-3 record validation)
set -u
cd /root/repo
echo "=== probe $(date -u +%H:%M:%S) ==="
timeout 1500 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(jnp.ones((8,8)).sum())" || { echo "PROBE FAILED rc=$?"; exit 1; }
echo "=== blockfuse $(date -u +%H:%M:%S) ==="
timeout 2400 python _profile_r3.py blockfuse
echo "rc=$?"
echo "=== infersweep $(date -u +%H:%M:%S) ==="
timeout 2400 python _profile_r3.py infersweep
echo "rc=$?"
echo "=== trainsweep $(date -u +%H:%M:%S) ==="
timeout 2400 python _profile_r3.py trainsweep
echo "rc=$?"
echo "=== bench $(date -u +%H:%M:%S) ==="
timeout 2400 python bench.py
echo "rc=$?"
echo "=== done $(date -u +%H:%M:%S) ==="
