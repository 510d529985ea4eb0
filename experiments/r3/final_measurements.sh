#!/bin/bash
# Round-3 final measurement queue: produce the artifacts the response map
# cites (packed-params A/B, b4096 microbatch bench, multi-MP frame,
# eval-CLI s/frame).  SEQUENTIAL — never two TPU processes at once.
set -x
cd /root/repo
R3=experiments/r3

# 1. Packed-params Pallas A/B (VERDICT r2 item 3 closure evidence)
if [ ! -f $R3/packed_params_results.json ]; then
  timeout 5400 python $R3/packed_params_ab.py \
    > $R3/packed_params_ab.log 2>&1
fi

# 2. b4096 plain vs --microbatch 4 (VERDICT r2 item 5 closure evidence)
if [ ! -f $R3/bench_b4096_plain.log ]; then
  BENCH_COMPILE_CACHE=/tmp/bench_expt_cache BENCH_BATCH=4096 BENCH_DEVICE_POOL=0 BENCH_BUDGET_S=900 \
    timeout 1200 python bench.py > $R3/bench_b4096_plain.log 2>&1
fi
if [ ! -f $R3/bench_b4096_mb4.log ]; then
  BENCH_COMPILE_CACHE=/tmp/bench_expt_cache BENCH_BATCH=4096 BENCH_MICROBATCH=4 BENCH_DEVICE_POOL=0 BENCH_BUDGET_S=900 \
    timeout 1200 python bench.py > $R3/bench_b4096_mb4.log 2>&1
fi

# 3. Multi-megapixel frame through the bounded in-flight window
if [ ! -f $R3/multimp_frame.log ]; then
  timeout 3600 python $R3/multimp_frame.py > $R3/multimp_frame.log 2>&1
fi

# 4. Eval CLI s/frame at 400^2 NeRF-W (VERDICT r2 item 4 target <=0.95)
CK=/tmp/qm_ckpts800/qm8_color_nerfw/epoch=9.ckpt
if [ -f $CK ] && [ ! -f $R3/eval_sframe.log ]; then
  timeout 3600 python eval.py --dataset_name blender \
    --root_dir /tmp/qm_scene800 --split test --img_wh 400 400 \
    --N_importance 64 --compute_dtype bfloat16 \
    --encode_a --encode_t --beta_min 0.1 \
    --ckpt_path $CK --scene_name evaltime \
    > $R3/eval_sframe.log 2>&1
fi

echo "=== FINAL MEASUREMENTS DONE ==="
tail -3 $R3/packed_params_ab.log $R3/bench_b4096_plain.log \
  $R3/bench_b4096_mb4.log $R3/multimp_frame.log $R3/eval_sframe.log
