#!/bin/bash
# Round-5 TPU queue, stage 4 — the real-data readiness drill, learnable
# edition (VERDICT r4 #7).  The seq2 drill proved the path mechanically
# but its synthetic classes were visually random (round-5 finding:
# appearance was independent of category, so the classifier correctly
# learned nothing and mAP was 0.006).  With class-determined colors the
# same command sequence demonstrates end-to-end LEARNING on COCO-format
# data: generate -> train (bucketed) -> full-protocol eval (now with the
# evaluate --buckets flag this round added).
#
# Swapping the two dataset paths for real COCO
# (instances_train2017.json + train2017/) is the whole migration.
#
# Launch: cd /root/repo && nohup bash experiments/_tpu_r5_seq4.sh \
#           > /tmp/r5seq4.log 2>&1 &
set -x
cd /root/repo

time python -m retinanet_tpu.data.synthetic_coco /tmp/r5coco2 \
  --num-images 1000 --num-classes 20 --seed 0

DS="--dataset coco /tmp/r5coco2/instances.json /tmp/r5coco2/images"
BK="--buckets 640x640 640x480 480x640"

rm -rf experiments/r5_coco_drill2
time timeout 7200 python -m retinanet_tpu.train $DS $BK \
  --experiment experiments/r5_coco_drill2 --backbone resnet_50_dense \
  --scale 640 --dropout 0 --batch-size 16 --learning-rate 1e-2 --seed 7 \
  --epochs 10 --steps-per-epoch 60 --log-every 60

time timeout 3600 python -m retinanet_tpu.evaluate $DS $BK \
  --experiment experiments/r5_coco_drill2 --backbone resnet_50_dense \
  --scale 640 --batch-size 8

echo R5_SEQ4_DONE
