"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline = end-to-end inference throughput (forward + decode + classwise NMS)
of ResNet(ResNeXt)-50-FPN RetinaNet @640px on one chip, vs the north-star
baseline of 2000 images/sec/chip (BASELINE.json).
"""

import json
import sys

BASELINE_IMAGES_PER_SEC = 2000.0


def main():
    from retinanet_tpu.utils.cli import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    import jax

    from retinanet_tpu.config import Config
    from retinanet_tpu.infer import benchmark

    config = Config()
    # Flagship: dense ResNet-50 (the reference's 'resnet_50' is ResNeXt,
    # whose 4-channel grouped convs waste the MXU; both are available).
    config = dataclasses.replace(
        config, model=dataclasses.replace(config.model,
                                          backbone="resnet_50_dense"))
    on_tpu = jax.default_backend() == "tpu"
    batch_size = 64 if on_tpu else 2
    steps = 20 if on_tpu else 2
    result = benchmark(config, batch_size=batch_size, steps=steps,
                       warmup=3 if on_tpu else 1, num_classes=80)

    print(json.dumps({
        "metric": "resnet50_fpn_retinanet_inference_640px",
        "value": round(result["images_per_sec"], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(result["images_per_sec"]
                             / BASELINE_IMAGES_PER_SEC, 4),
        "p50_latency_ms": round(result["p50_latency_ms"], 2),
        "batch_size": result["batch_size"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.exit(main())
