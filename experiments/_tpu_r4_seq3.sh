#!/bin/bash
# Round-4 TPU queue, stage 3: pretrained-import convergence (VERDICT #6)
# plus focal-eff128 eval (experiment C trains in stage 1's window).
# Waits for stage 2 (_tpu_r4_seq2.sh) to print R4_PERF_DONE.
# Launch: nohup bash _tpu_r4_seq3.sh > /tmp/r4seq3.log 2>&1 &
set -x
cd /root/repo

while ! grep -q R4_PERF_DONE /tmp/r4seq2.log 2>/dev/null; do sleep 60; done

DS="--dataset shapes /tmp/r4shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --log-every 100 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

echo "=== EVAL C focal-eff128 ==="
timeout 2400 $EV --experiment experiments/r4_focal128

# ---- D/E: pretrained-import convergence (VERDICT #6) ----------------------
python - <<'EOF'
import sys
sys.path.insert(0, "tests")
import numpy as np
from test_pretrained_torch import synth_torchvision_resnet50
np.savez("/tmp/tv_resnet50.npz", **synth_torchvision_resnet50(seed=3))
print("synth torchvision state_dict written")
EOF
timeout 3600 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_imported --batch-size 16 \
  --epochs 50 --steps-per-epoch 12 --init-backbone /tmp/tv_resnet50.npz
timeout 3600 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_scratch --batch-size 16 \
  --epochs 50 --steps-per-epoch 12
echo "=== EVAL D imported-init @600 ==="
timeout 2400 $EV --experiment experiments/r4_imported
echo "=== EVAL E scratch @600 ==="
timeout 2400 $EV --experiment experiments/r4_scratch

echo "R4_SEQ3_DONE"
