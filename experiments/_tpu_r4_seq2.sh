#!/bin/bash
# Round-4 resequenced TPU queue: the perf probes feed BENCH_r04 and the
# fused-train adoption decision, so they run BEFORE experiments C/D/E.
# Waits for the in-flight focal-B train (started by _tpu_r4_experiments2.sh
# before its wrapper was stopped) to release the TPU.
# Launch: nohup bash _tpu_r4_seq2.sh <wait_pid> > /tmp/r4seq2.log 2>&1 &
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

DS="--dataset shapes /tmp/r4shapes 200 640"
EV="python -m retinanet_tpu.evaluate $DS --backbone resnet_50_dense \
  --scale 640 --batch-size 8"

echo "=== EVAL B focal ==="
timeout 2400 $EV --experiment experiments/r4_focal

# ---- perf probes (feed BENCH_r04 + fused-train adoption) -------------------
timeout 2400 python _profile_r4.py fusedtrain 640
timeout 2400 python _profile_r4.py fusedstages 128 640
timeout 2400 python _profile_r4.py batchsweep 640
timeout 2400 python _profile_r4.py gnbwd 640
echo "R4_PERF_DONE"
