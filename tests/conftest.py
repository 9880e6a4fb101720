"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before jax initializes its backends — this makes
multi-chip sharding unit-testable without TPU hardware (SURVEY.md §4:
"Testing multi-node without a cluster").
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Belt and braces: if anything imported jax before this conftest (snapshotting
# the axon env), force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
