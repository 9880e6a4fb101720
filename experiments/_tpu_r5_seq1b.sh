#!/bin/bash
# Round-5 focal story, take 2.  The take-1 run (warmup_cosine(150),
# horizon 2400, NO clip) collapsed to all-background between steps 300
# and 400 — exactly when warmup reached sustained peak lr 1e-2 (curve in
# experiments/r5_focal128_2400/metrics.jsonl; class_loss 0.033 -> 2.63,
# class_iou 0.871 -> 0, then flat ~2.3 through step 800).  The 600-step
# r4 run survived because its cosine horizon started decaying LR
# immediately after warmup.  Take 2 adds --grad-clip-norm 2 (~3x the
# healthy steady-state grad norm, under the collapse-region spikes) and
# logs every 20 steps so the transition is visible.
#
# Launch: nohup bash experiments/_tpu_r5_seq1b.sh \
#           > /tmp/r5seq1b.log 2>&1 &
set -x
cd /root/repo

DS="--dataset shapes /tmp/r5shapes 200 640"
COMMON="--backbone resnet_50_dense --scale 640 --dropout 0 \
  --learning-rate 1e-2 --log-every 20 --seed 7"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

rm -rf experiments/r5_focal128_2400_clip
timeout 12000 python -m retinanet_tpu.train $DS $COMMON \
  --experiment experiments/r5_focal128_2400_clip --batch-size 128 \
  --grad-accum 4 --epochs 2400 --steps-per-epoch 1 --class-loss focal \
  --schedule warmup_cosine --warmup-steps 150 --schedule-steps 2400 \
  --grad-clip-norm 2
echo "=== EVAL focal128-warmup-clip @2400 ==="
timeout 2400 $EV --experiment experiments/r5_focal128_2400_clip
echo "=== EVAL focal128-warmup-clip @2400 avg-ckpt-2 ==="
timeout 2400 $EV --experiment experiments/r5_focal128_2400_clip \
  --average-checkpoints 2
echo R5_SEQ1B_DONE
