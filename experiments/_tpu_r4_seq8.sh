#!/bin/bash
# Round-4 TPU queue, stage 8: on-TPU bwd numerics check (seq7's inline
# check had a dtype typo), res4-strips + bwd-strips sweeps, batch sweep
# under the adopted strip config, and XLA-flags probes.  Waits for seq7.
# Launch: nohup bash _tpu_r4_seq8.sh > /tmp/r4seq8.log 2>&1 &
set -x
cd /root/repo

while ! grep -q R4_SEQ7_DONE /tmp/r4seq7.log 2>/dev/null; do sleep 60; done

# 1. On-TPU numerics: kernel vs XLA autodiff through the test reference.
timeout 1800 python - <<'EOF'
import sys
sys.path.insert(0, "tests")
import jax, jax.numpy as jnp, numpy as np
from test_pallas_bottleneck_bwd import (_randomized_params, _packed,
                                        _ref_grads)
from retinanet_tpu.models.resnet import ResNetBottleneck
from retinanet_tpu.ops.pallas.bottleneck_bwd import fused_bottleneck_bwd

for (h, w, c, f) in ((80, 80, 512, 128), (160, 160, 256, 64)):
    block = ResNetBottleneck(filters=f, project=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, h, w, c), jnp.bfloat16)
    params = _randomized_params(block, x)
    cot = jnp.asarray(np.random.RandomState(1).randn(2, h, w, c), jnp.bfloat16)
    dx_ref, dp_ref = _ref_grads(block, params, x, cot)
    ref = (dx_ref, *dp_ref)
    got = jax.jit(lambda x, *a: fused_bottleneck_bwd(x, cot, *a))(
        x, *_packed(params))
    names = ["dx","dk1","dg1","db1","dk2","dg2","db2","dk3","dg3","db3"]
    print(f"--- res shape {h}x{w}x{c} ---", flush=True)
    for n, a, k in zip(names, ref, got):
        a = np.asarray(a, np.float32); k = np.asarray(k, np.float32)
        denom = max(1e-6, float(np.abs(a).max()))
        rel = float(np.abs(a - k).max()) / denom
        corr = float(np.corrcoef(a.ravel(), k.ravel())[0, 1])
        print(f"{n:4s} rel-max-err {rel:.4f}  corr {corr:.6f}", flush=True)
EOF

# 2. res4 strips (serving).
timeout 2400 python _profile_r4.py r4levers2 128 640

# 3. bwd strip-size sweep (training, b32).
timeout 2400 python _profile_r4.py bwdstrips 640

# 4. batch sweep under the adopted strip config.
timeout 2400 python _profile_r4.py batchsweep2 640

# 5. XLA-flags probes (fresh process each; flags read at init).
timeout 1200 python _profile_r4.py point 128 640
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  timeout 1200 python _profile_r4.py point 128 640
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  timeout 1200 python _profile_r4.py point 128 640

echo R4_SEQ8_DONE
