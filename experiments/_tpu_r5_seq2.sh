#!/bin/bash
# Round-5 TPU queue, stage 2 — the real-data readiness drill (VERDICT r4
# #7): the EXACT user-facing command sequence a COCO user would run
# (train CLI -> evaluate CLI on a COCO-format root), proven against a
# 1k-image synthetic COCO tree and timed.  Swapping the two paths for
# /data/coco/annotations/instances_train2017.json + /data/coco/train2017
# is the whole migration.
#
# Launch: cd /root/repo && nohup bash experiments/_tpu_r5_seq2.sh \
#           > /tmp/r5seq2.log 2>&1 &
set -x
cd /root/repo

# 1. A COCO-format dataset root (stand-in for real COCO until data exists
#    in this environment): 1000 rectangular images, 20 classes, crowds.
time python -m retinanet_tpu.data.synthetic_coco /tmp/r5coco \
  --num-images 1000 --num-classes 20 --seed 0

DS="--dataset coco /tmp/r5coco/instances.json /tmp/r5coco/images"
BK="--buckets 640x640 640x480 480x640"

# 2. Train on it — bucketed rectangular canvases, flagship backbone.
rm -rf experiments/r5_coco_drill
time timeout 7200 python -m retinanet_tpu.train $DS $BK \
  --experiment experiments/r5_coco_drill --backbone resnet_50_dense \
  --scale 640 --dropout 0 --batch-size 16 --learning-rate 1e-2 --seed 7 \
  --epochs 10 --steps-per-epoch 60 --log-every 60

# 3. Full-protocol COCO evaluation (crowds as ignores, area buckets,
#    empty images) over the whole set.
time timeout 3600 python -m retinanet_tpu.evaluate $DS $BK \
  --experiment experiments/r5_coco_drill --backbone resnet_50_dense \
  --scale 640 --batch-size 8

echo R5_SEQ2_DONE
