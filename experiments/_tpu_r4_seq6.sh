#!/bin/bash
# Round-4 TPU queue, stage 6: imported-init convergence with REALISTICALLY
# scaled synthetic torchvision weights (kaiming convs, γ≈1/β≈0 norms).
# The seq4 run used unscaled randn weights — it proved the import is
# genuinely applied (mAP 0.05 vs scratch 0.62; a no-op importer would have
# matched scratch) but measured init pathology, not plumbing.  This run
# answers the plumbing question: sane-random imported init should track
# the scratch curve.  Waits for stage 5.
# Launch: nohup bash _tpu_r4_seq6.sh > /tmp/r4seq6.log 2>&1 &
set -x
cd /root/repo

while ! grep -q R4_SEQ5_DONE /tmp/r4seq5.log 2>/dev/null; do sleep 60; done

DS="--dataset shapes /tmp/r4shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

python - <<'EOF'
import sys
sys.path.insert(0, "tests")
import numpy as np
from test_pretrained_torch import synth_torchvision_resnet50
np.savez("/tmp/tv_resnet50_real.npz",
         **synth_torchvision_resnet50(seed=3, realistic=True))
print("realistic synth torchvision state_dict written")
EOF

rm -rf experiments/r4_imported_real
timeout 3600 python -m retinanet_tpu.train $DS $COMMON --log-every 100 \
  --experiment experiments/r4_imported_real --batch-size 16 \
  --epochs 50 --steps-per-epoch 12 \
  --init-backbone /tmp/tv_resnet50_real.npz
echo "=== EVAL imported-real @600 ==="
timeout 2400 $EV --experiment experiments/r4_imported_real

echo R4_SEQ6_DONE
