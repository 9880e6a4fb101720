#!/bin/bash
# Round-4 experiment queue — ONE TPU process at a time (tunnel rules).
# VERDICT r3 #3 (focal at scale), #6 (pretrained-init convergence),
# #1 adoption gate (fused_res2 strips mAP), #8c (avg-checkpoints mAP).
# Launch: nohup bash _tpu_r4_experiments.sh > /tmp/r4exp.log 2>&1 &
set -x
cd /root/repo

DS="--dataset shapes /tmp/r4shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --log-every 100 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

# ---- A: control (bce+dice), b32, 2400 steps -------------------------------
timeout 5400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_bce --batch-size 32 \
  --epochs 400 --steps-per-epoch 6
echo "=== EVAL A exact ==="
timeout 2400 $EV --experiment experiments/r4_bce
echo "=== EVAL A fused-blocks (serving parity) ==="
timeout 2400 $EV --experiment experiments/r4_bce --approx-top-k \
  --fused-blocks
echo "=== EVAL A fused-blocks + fused-res2 strips (ADOPTION GATE) ==="
timeout 2400 $EV --experiment experiments/r4_bce --approx-top-k \
  --fused-blocks --fused-res2
echo "=== EVAL A average-checkpoints 2 (VERDICT #8c) ==="
timeout 2400 $EV --experiment experiments/r4_bce --average-checkpoints 2

# ---- B: focal, b32, 2400 steps --------------------------------------------
timeout 5400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_focal --batch-size 32 \
  --epochs 400 --steps-per-epoch 6 --class-loss focal
echo "=== EVAL B focal ==="
timeout 2400 $EV --experiment experiments/r4_focal

# ---- C: focal, effective batch 128 (b128 x grad-accum 4), 600 steps -------
timeout 5400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_focal128 --batch-size 128 --grad-accum 4 \
  --epochs 600 --steps-per-epoch 1 --class-loss focal
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

echo "ALL_R4_EXPERIMENTS_DONE"
