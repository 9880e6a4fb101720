#!/bin/bash
# Round-5 TPU queue, stage 3 — post-checkpoint adoption gates.
#   (a) fused_res4_strips=10 mAP gate: the serving lever measured 1.011x
#       in-model (NOTES r5) adopts into bench defaults only if mAP on a
#       trained checkpoint matches the exact path (the res2-strips
#       precedent: -0.0009 = noise, adopted).  Gates on the seq2 COCO
#       drill checkpoint (600 steps, flagship backbone, 20 classes).
#   (b) res4gate throughput confirmation on the current adopted stack.
#   (c) fused-train b64 point to complete the adoption envelope
#       (b16 0.976x, b32 1.039x — where does the win start?).
#
# Launch: cd /root/repo && nohup bash experiments/_tpu_r5_seq3.sh \
#           > /tmp/r5seq3.log 2>&1 &
set -x
cd /root/repo

CKPT=experiments/r5_coco_drill
DS="--dataset coco /tmp/r5coco/instances.json /tmp/r5coco/images"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8 --max-images 300 --experiment $CKPT \
  --fused-blocks --fused-res2 --fused-res3-strips 10 --approx-top-k"

echo "=== (a) mAP gate: adopted serving stack (res2s20+res3s10) ==="
timeout 2400 $EV
echo "=== (a) mAP gate: +res4 strips=10 ==="
timeout 2400 $EV --fused-res4-strips 10

echo "=== (b) res4gate in-model throughput confirmation ==="
PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/experiments \
  timeout 2400 python experiments/_profile_r5.py res4gate

echo "=== (c) fused-train b64 envelope point ==="
PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/experiments \
  timeout 2400 python experiments/_profile_r5.py bwdenvelope

echo R5_SEQ3_DONE
