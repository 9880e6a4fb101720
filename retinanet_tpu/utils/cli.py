"""Small CLI utilities (reference ``utils.py:16-19`` colored arg echo and
``utils.py:311-315`` GPU enumeration)."""

from __future__ import annotations

import dataclasses
from typing import Any


def log_args(args: Any) -> None:
    """Colored echo of parsed arguments / config (reference ``log_args``).

    Accepts an argparse.Namespace or any dataclass; falls back to plain
    print when termcolor is unavailable.
    """
    try:
        from termcolor import colored
    except ImportError:  # pragma: no cover
        colored = lambda s, _c: s  # noqa: E731

    if dataclasses.is_dataclass(args):
        items = dataclasses.asdict(args).items()
    else:
        items = vars(args).items()
    print(colored("arguments:", "yellow"))
    for key, value in sorted(items):
        print(colored(f"\t{key}:", "yellow"), value)


def enable_compilation_cache(path: str = "~/.cache/retinanet_tpu_xla") -> None:
    """Persistent XLA compilation cache: successive CLI invocations (train →
    evaluate → bench) reuse compiled executables instead of paying minutes of
    recompilation each.  Safe no-op if unsupported."""
    import os

    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - best effort
        pass


def force_platform(name: str | None) -> None:
    """Pin JAX to a platform in-process (``--platform cpu`` CLI flag).

    The ``JAX_PLATFORMS`` env var is NOT reliable when a platform plugin
    registers itself at import time (the axon TPU tunnel wins over the env
    var); ``jax.config.update`` is authoritative as long as it runs before
    the first device use — which is why every CLI applies this immediately
    after arg parsing.  No-op when ``name`` is None/empty.
    """
    if name:
        import jax

        jax.config.update("jax_platforms", name)


def get_num_devices() -> int:
    """TPU-native ``get_num_gpus`` (reference ``utils.py:311-315``): count of
    accelerator devices visible to JAX."""
    import jax

    return len(jax.devices())
