"""Metrics / observability (reference §5: TensorBoard scalar + histogram +
image summaries, ``train.py:123,164-187``, ``losses.py:160-163``).

No TensorBoard is available in this environment, so the writer emits
newline-delimited JSON (``metrics.jsonl``) — trivially greppable/plottable —
and keeps the reference's key diagnostics: learning rate, losses, and the
author's fg/bg predicted-probability histograms (fixed 20-bin counts computed
on device).  Box-overlay images are rendered post-step by
``retinanet_tpu.utils.draw`` when requested.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

HIST_BINS = 20


def prob_histograms(class_targets: Array, class_probs: Array,
                    trainable_mask: Array) -> Dict[str, Array]:
    """fg/bg predicted-prob histograms (reference ``losses.py:160-163``).

    Static-shape: weighted bincount over 20 fixed bins in [0, 1].
    """
    w = trainable_mask.astype(jnp.float32)[..., None] * jnp.ones_like(
        class_targets)
    fg_w = w * (class_targets == 1)
    bg_w = w * (class_targets == 0)
    bins = jnp.clip((class_probs * HIST_BINS).astype(jnp.int32), 0,
                    HIST_BINS - 1)
    # Per-bin masked reductions — a one-hot [..., BINS] tensor here would
    # materialize B×N×C×20 floats (50 GB at batch 16 @640px/80cls).
    fg = jnp.stack([jnp.sum(jnp.where(bins == i, fg_w, 0.0))
                    for i in range(HIST_BINS)])
    bg = jnp.stack([jnp.sum(jnp.where(bins == i, bg_w, 0.0))
                    for i in range(HIST_BINS)])
    return {"prob_fg_hist": fg, "prob_bg_hist": bg}


class MetricsWriter:
    """Metrics sink: JSONL (greppable) + native TensorBoard event files.

    Scalars land in both; ``*_hist`` arrays (the fixed-20-bin fg/bg prob
    counts) become TensorBoard histograms (``utils.tb_events`` writes the
    event-file format without a TF dependency — reference parity with
    ``train.py:123,183-187``).
    """

    def __init__(self, experiment_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = True):
        os.makedirs(experiment_dir, exist_ok=True)
        self._path = os.path.join(experiment_dir, filename)
        self._file = open(self._path, "a")
        self._tb = None
        if tensorboard:
            from retinanet_tpu.utils.tb_events import TBEventWriter
            self._tb = TBEventWriter(experiment_dir)

    def write(self, step: int, metrics: Dict, prefix: Optional[str] = None):
        record = {"step": int(step), "time": time.time()}
        scalars, hists = {}, {}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                v = np.asarray(v)
                record[key] = v.tolist() if v.ndim else float(v)
            else:
                record[key] = v
            if isinstance(record[key], float):
                scalars[key] = record[key]
            elif key.endswith("_hist") and np.ndim(record[key]) == 1:
                hists[key] = np.asarray(record[key], np.float64)
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            self._tb.add_scalars(scalars, step)
            for key, counts in hists.items():
                limits = np.linspace(1.0 / len(counts), 1.0, len(counts))
                self._tb.add_histogram_counts(key, counts, limits, step)

    def add_image_png(self, tag: str, png_bytes: bytes, height: int,
                      width: int, step: int):
        if self._tb is not None:
            self._tb.add_image_png(tag, png_bytes, height, width, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
