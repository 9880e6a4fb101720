#!/bin/bash
# Round-4 TPU queue, stage 4: focal-eff128 explosion diagnosis + the
# pretrained-import convergence rerun (seq3's run died on the
# state._replace typo, now fixed and regression-tested).
#
# Launch: nohup bash _tpu_r4_seq4.sh > /tmp/r4seq4.log 2>&1 &
set -x
cd /root/repo

DS="--dataset shapes /tmp/r4shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

# ---- A: grad-accum attribution (accum=1 vs accum=4, one focal step) -------
timeout 1800 python _profile_r4.py accumcheck 32 640

# ---- B: focal eff-128 divergence onset (fine-grained logs, 150 steps) -----
rm -rf experiments/r4_focal_onset
timeout 3600 python -m retinanet_tpu.train $DS $COMMON --log-every 5 \
  --experiment experiments/r4_focal_onset --batch-size 128 --grad-accum 4 \
  --epochs 150 --steps-per-epoch 1 --class-loss focal

# ---- C: control: bce+dice at the SAME eff-128 config ----------------------
rm -rf experiments/r4_bce_onset
timeout 3600 python -m retinanet_tpu.train $DS $COMMON --log-every 5 \
  --experiment experiments/r4_bce_onset --batch-size 128 --grad-accum 4 \
  --epochs 150 --steps-per-epoch 1

# ---- D: focal eff-128 rescue: LR warmup (the paper recipe) ----------------
rm -rf experiments/r4_focal128_warmup
timeout 7200 python -m retinanet_tpu.train $DS $COMMON --log-every 25 \
  --experiment experiments/r4_focal128_warmup --batch-size 128 \
  --grad-accum 4 --epochs 600 --steps-per-epoch 1 --class-loss focal \
  --schedule warmup_cosine --warmup-steps 150 --schedule-steps 600
echo "=== EVAL focal128-warmup ==="
timeout 2400 $EV --experiment experiments/r4_focal128_warmup

# ---- E/F: pretrained-import convergence rerun (VERDICT #6) ----------------
python - <<'EOF'
import sys
sys.path.insert(0, "tests")
import numpy as np
from test_pretrained_torch import synth_torchvision_resnet50
np.savez("/tmp/tv_resnet50.npz", **synth_torchvision_resnet50(seed=3))
print("synth torchvision state_dict written")
EOF
rm -rf experiments/r4_imported
timeout 3600 python -m retinanet_tpu.train $DS $COMMON --log-every 100 \
  --experiment experiments/r4_imported --batch-size 16 \
  --epochs 50 --steps-per-epoch 12 --init-backbone /tmp/tv_resnet50.npz
echo "=== EVAL imported-init @600 ==="
timeout 2400 $EV --experiment experiments/r4_imported

echo R4_SEQ4_DONE
