#!/bin/bash
# Round-4 TPU queue, stage 5: new serving levers A/B (fused_proj,
# fused_res3_strips) + Mosaic compile-failure bisection for the fused
# backward / Pallas-GN b32 kernels.  Waits for stage 4.
# Launch: nohup bash _tpu_r4_seq5.sh > /tmp/r4seq5.log 2>&1 &
set -x
cd /root/repo

while ! grep -q R4_SEQ4_DONE /tmp/r4seq4.log 2>/dev/null; do sleep 60; done

timeout 3600 python _profile_r4.py r4levers 128 640
timeout 1800 python _profile_r4.py stride2probe 8 640
timeout 3600 python _r4_mosaic_debug.py bwd
timeout 3600 python _r4_mosaic_debug.py gn

echo R4_SEQ5_DONE
