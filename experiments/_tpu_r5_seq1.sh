#!/bin/bash
# Round-5 TPU queue, stage 1 — ONE TPU process at a time (tunnel rules).
# VERDICT r4 #4: the focal story at equal optimizer steps — focal eff-128
# + warmup_cosine(150) run to 2400 optimizer steps, next to the r4
# bce+dice b32 control (mAP 0.7510 at 2400 steps).  Plus the matched
# bce+dice control at the SAME eff-128+warmup config so the comparison is
# config-for-config, not just step-for-step.
#
# Launch: cd /root/repo && nohup bash experiments/_tpu_r5_seq1.sh \
#           > /tmp/r5seq1.log 2>&1 &
set -x
cd /root/repo

DS="--dataset shapes /tmp/r5shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --log-every 100 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

# ---- A: focal eff-128 + warmup_cosine, 2400 optimizer steps ---------------
rm -rf experiments/r5_focal128_2400
timeout 14400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r5_focal128_2400 --batch-size 128 \
  --grad-accum 4 --epochs 2400 --steps-per-epoch 1 --class-loss focal \
  --schedule warmup_cosine --warmup-steps 150 --schedule-steps 2400
echo "=== EVAL focal128-warmup @2400 ==="
timeout 2400 $EV --experiment experiments/r5_focal128_2400
echo "=== EVAL focal128-warmup @2400 avg-ckpt-2 ==="
timeout 2400 $EV --experiment experiments/r5_focal128_2400 \
  --average-checkpoints 2

# ---- B: bce+dice control at the SAME eff-128+warmup config ----------------
rm -rf experiments/r5_bce128_2400
timeout 14400 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r5_bce128_2400 --batch-size 128 \
  --grad-accum 4 --epochs 2400 --steps-per-epoch 1 \
  --schedule warmup_cosine --warmup-steps 150 --schedule-steps 2400
echo "=== EVAL bce128-warmup @2400 ==="
timeout 2400 $EV --experiment experiments/r5_bce128_2400
echo "=== EVAL bce128-warmup @2400 avg-ckpt-2 ==="
timeout 2400 $EV --experiment experiments/r5_bce128_2400 \
  --average-checkpoints 2

echo R5_SEQ1_DONE
