#!/bin/bash
# Round-4 perf measurement queue — run AFTER _tpu_r4_experiments.sh
# (ONE TPU process at a time; tunnel rules).
set -x
cd /root/repo

# Where does serving time sit after the res3+/res2 fusions?
timeout 2400 python _profile_r4.py fusedstages 128 640

# Re-pick the serving batch size on the fused config.
timeout 2400 python _profile_r4.py batchsweep 640

# VERDICT r3 #4 "at minimum": Pallas fwd+bwd GroupNorm custom_vjp in the
# real train step (round-2 rejection predates the round-3 Mosaic fixes).
timeout 2400 python _profile_r4.py gnbwd 640

# VERDICT r3 #4, the real lever: hand-fused whole-block Pallas BACKWARD
# (ops/pallas/bottleneck_bwd.py) in the full train step.
timeout 2400 python _profile_r4.py fusedtrain 640

echo "ALL_R4_PERF_DONE"
