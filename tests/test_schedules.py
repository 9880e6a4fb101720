"""LR schedule tests."""

import numpy as np

from retinanet_tpu.config import TrainConfig
from retinanet_tpu.train import build_schedule


def test_constant():
    s = build_schedule(TrainConfig(learning_rate=0.5))
    assert float(s(0)) == 0.5
    assert float(s(10_000)) == 0.5


def test_cosine():
    cfg = TrainConfig(learning_rate=1.0, schedule="cosine",
                      schedule_steps=100, min_lr_fraction=0.1)
    s = build_schedule(cfg)
    assert float(s(0)) == 1.0
    np.testing.assert_allclose(float(s(100)), 0.1, atol=1e-6)
    assert 0.1 < float(s(50)) < 1.0


def test_warmup_cosine():
    cfg = TrainConfig(learning_rate=1.0, schedule="warmup_cosine",
                      warmup_steps=10, schedule_steps=100,
                      min_lr_fraction=0.01)
    s = build_schedule(cfg)
    assert float(s(0)) <= 0.02
    np.testing.assert_allclose(float(s(10)), 1.0, atol=1e-6)
    assert float(s(100)) <= 0.02


def test_cyclical():
    cfg = TrainConfig(learning_rate=1.0, schedule="cyclical",
                      schedule_steps=100, min_lr_fraction=0.0)
    s = build_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(s(50)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-6)


def test_invalid_schedule():
    import pytest
    with pytest.raises(ValueError):
        build_schedule(TrainConfig(schedule="nope"))
