#!/bin/bash
# Round-4 experiment queue, part 2 — resumes after the 12:45 crash killed
# the original queue mid-focal.  Experiment A (bce control) completed and
# is recorded in /tmp/r4exp.log + NOTES.md; this file re-runs B onward.
# ONE TPU process at a time (tunnel rules).
# Launch: nohup bash _tpu_r4_experiments2.sh > /tmp/r4exp2.log 2>&1 &
set -x
cd /root/repo

DS="--dataset shapes /tmp/r4shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --log-every 100 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

# ---- B: focal, b32, 2400 steps --------------------------------------------
rm -rf experiments/r4_focal
timeout 5400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r4_focal --batch-size 32 \
  --epochs 400 --steps-per-epoch 6 --class-loss focal
echo "=== EVAL B focal ==="
timeout 2400 $EV --experiment experiments/r4_focal

# ---- C: focal, effective batch 128 (b32 x grad-accum 4), 2400 micro =
#      600 optimizer steps ---------------------------------------------------
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
