"""Host-side data pipeline and dataset loaders."""

from retinanet_tpu.data.pipeline import Batch, build_pipeline  # noqa: F401
