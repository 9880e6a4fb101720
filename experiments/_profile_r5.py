"""Round-5 TPU measurement harness (VERDICT r4 directives #3/#6).

One subcommand per TPU process (tunnel rules):

    timeout 2400 python experiments/_profile_r5.py bwdoverlap
    timeout 2400 python experiments/_profile_r5.py res4gate

Run with PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/experiments
(APPEND to the axon site dir — replacing PYTHONPATH drops the TPU plugin,
NOTES round 5).
"""
import dataclasses
import sys

from _profile_r3 import _flagship


def bwdoverlap(size=640):
    """A/B of the DMA-overlapped fused backward (x-plane prefetch across
    the batch grid + double-buffered dout strips) in the full train step.
    Controls: XLA autodiff, and the pre-overlap numbers recorded in NOTES
    (b32: 124.8/125.5/126.0 img/s at strips 10/20/40; b16 121.6 @20)."""
    from retinanet_tpu import train as T

    config, *_ = _flagship(1, size)
    for tag, fused, rows in (("xla   ", False, 0), ("ov s20", True, 20),
                             ("ov s40", True, 40)):
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              fused_train=fused,
                                              fused_bwd_strip_rows=rows
                                              or 20))
        for b in (16, 32):
            try:
                r = T.benchmark_train(cfg, batch_size=b, steps=6, warmup=2)
                print(f"bwd={tag} b{b:<3d} {r['images_per_sec']:7.1f} img/s"
                      f"  {r['step_ms']:7.1f} ms/step", flush=True)
            except Exception as e:
                print(f"bwd={tag} b{b}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


def res4gate(batch=128, size=640):
    """Confirmation point for the res4 strips=10 serving lever on top of
    the adopted config before flipping the bench default (r4levers2:
    585.3 -> 591.6 img/s)."""
    from retinanet_tpu.infer import make_inference_fn
    from retinanet_tpu.models.retinanet import RetinaNet
    from _profile_r3 import timeit

    config, levels, _, params, images = _flagship(batch, size,
                                                  use_approx_top_k=True)
    for name, kw in (("res3s10 (adopted)", {}),
                     ("+res4s10", {"fused_res4_strips": 10})):
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, fused_blocks=True, fused_res2=True,
                fused_res3_strips=10, **kw))
        model_f = RetinaNet.from_config(cfg.model, levels.num_anchors, 80)
        fn = make_inference_fn(model_f, levels, cfg)
        t = timeit(fn, params, images)
        print(f"{name:20s} {batch/t:7.1f} img/s  {t*1e3:7.1f} ms",
              flush=True)


def bwdenvelope(size=640):
    """b64 point for the DMA-overlapped fused backward: completes the
    batch-size envelope (b16 0.976x, b32 1.039x vs XLA — NOTES r5) so
    the --fused-train guidance states where the win starts."""
    from retinanet_tpu import train as T

    config, *_ = _flagship(1, size)
    for tag, fused in (("xla   ", False), ("ov s20", True)):
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              fused_train=fused,
                                              fused_bwd_strip_rows=20))
        for b in (64,):
            try:
                r = T.benchmark_train(cfg, batch_size=b, steps=6, warmup=2)
                print(f"bwd={tag} b{b:<3d} {r['images_per_sec']:7.1f} img/s"
                      f"  {r['step_ms']:7.1f} ms/step", flush=True)
            except Exception as e:
                print(f"bwd={tag} b{b}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1]
    args = [int(a) for a in sys.argv[2:]]
    globals()[cmd](*args)
