"""On-device image normalization (reference ``train.py:48-49`` applies
mean/std inside the tf.data map; here it can run on-device so training
batches cross host→device as uint8 — 4× less transfer).

The train step and the inference fn both call :func:`maybe_normalize`:
float inputs are assumed already normalized (the evaluation/serving host
path), uint8 inputs get ``(x/255 − mean)/σ`` on device, which XLA fuses
into the stem conv's input read.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from retinanet_tpu.config import DataConfig


def maybe_normalize(images: Array, data_cfg: DataConfig) -> Array:
    """uint8 [B,H,W,3] → normalized float32; float input passes through."""
    if images.dtype != jnp.uint8:
        return images
    mean = jnp.asarray(data_cfg.mean, jnp.float32)
    std = jnp.asarray(data_cfg.std, jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean) / std
