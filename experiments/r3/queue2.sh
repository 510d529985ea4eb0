#!/bin/bash
# Round-3 TPU queue, part 2: waits for final_measurements.sh to finish,
# then (a) reruns the FIXED packed-params A/B (the first run hit the
# apply_nerf signature bug on the xla rows; pallas compiles are now
# cache-warm), then (b) runs the textured-fixture quality matrix.
# SEQUENTIAL — one TPU process at a time.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/finalmeas.pid)" 2>/dev/null; do sleep 60; done

mv experiments/r3/packed_params_ab.log experiments/r3/packed_params_ab_run1.log 2>/dev/null
rm -f experiments/r3/packed_params_results.json
timeout 5400 python experiments/r3/packed_params_ab.py \
  > experiments/r3/packed_params_ab.log 2>&1

bash experiments/r3/quality_matrix_tex.sh \
  > experiments/r3/quality_matrix_tex.log 2>&1

echo "=== QUEUE2 DONE ==="
