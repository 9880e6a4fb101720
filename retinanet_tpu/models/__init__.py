"""Flax models: backbones, FPN, detection heads, RetinaNet assembly."""

from retinanet_tpu.models.retinanet import RetinaNet, build_backbone  # noqa: F401
