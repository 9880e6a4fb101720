"""retinanet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) RetinaNet framework.

A from-scratch re-design of the capabilities of the reference
``vshmyhlo/retinanet-tensorflow`` (TF-1.x estimator implementation) for TPU:

* pure-function Flax models (``retinanet_tpu.models``): ResNeXt-50,
  DenseNet-BC-121/169, MobileNetV2 backbones + FPN + shared RetinaNet heads
* static-shape core ops (``retinanet_tpu.ops``): box geometry, anchor system,
  on-device vmapped label assignment, losses, padded top-k decode + NMS
* Pallas TPU kernels for the hot non-conv paths (``retinanet_tpu.ops.pallas``)
* data-parallel training over a ``jax.sharding.Mesh`` (``retinanet_tpu.parallel``)
* host-side data pipeline with COCO / Pascal VOC / synthetic Shapes loaders
  (``retinanet_tpu.data``)
* training driver with optax optimizers, Orbax checkpointing and JSONL metrics
  (``retinanet_tpu.train``), plus a first-class inference path
  (``retinanet_tpu.infer``) and COCO mAP evaluation (``retinanet_tpu.eval_coco``).
"""

__version__ = "0.1.0"

from retinanet_tpu.config import Config  # noqa: F401
