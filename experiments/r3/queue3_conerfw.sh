#!/bin/bash
# co_nerfw failure isolation, round 2 (textured fixture didn't rescue it):
#  A. --optimize_appearance eval of the textured co_nerfw ckpt: if the
#     paper-protocol score is high, the FIELD is healthy and the failure
#     is the untrained-a_id-0 eval convention on this fixture.
#  B. float32 exact-trig co_nerfw arm: rules the bf16/fast-trig perf path
#     in or out as the cause.
# SEQUENTIAL; waits for queue2 (textured matrix) to drain first.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done

SCENE=/tmp/qm_scene800t
CK=/tmp/qm_ckpts800t
EVCOMMON="--dataset_name blender --root_dir $SCENE --split test \
  --img_wh 200 200 --N_importance 64 --compute_dtype bfloat16 \
  --encode_a --encode_t --beta_min 0.1"

# A: paper-protocol appearance-optimized eval of the failing ckpt
timeout 1800 python eval.py $EVCOMMON \
  --ckpt_path $CK/qmt_co_nerfw/epoch=9.ckpt --scene_name qmt_co_nerfw_opta \
  --optimize_appearance \
  > experiments/r3/qmt_co_nerfw_opta_eval.log 2>&1
tail -1 experiments/r3/qmt_co_nerfw_opta_eval.log

# B: f32 exact-trig arm (same recipe otherwise)
COMMON="--dataset_name blender --root_dir $SCENE --img_wh 200 200 \
  --N_importance 64 --noise_std 0 --num_epochs 10 --batch_size 1024 \
  --optimizer adam --lr 5e-4 --lr_scheduler cosine --compute_dtype float32 \
  --steps_per_execution 8 --save_path $CK --refresh_every 0"
if [ ! -f $CK/qmt_co_nerfw_f32/epoch=9.ckpt ]; then
  timeout 4500 python train.py $COMMON --exp_name qmt_co_nerfw_f32 \
    --data_perturb color occ --encode_a --encode_t --beta_min 0.1 \
    > experiments/r3/qmt_co_nerfw_f32_train.log 2>&1
fi
timeout 1800 python eval.py --dataset_name blender --root_dir $SCENE \
  --split test --img_wh 200 200 --N_importance 64 --compute_dtype float32 \
  --encode_a --encode_t --beta_min 0.1 \
  --ckpt_path $CK/qmt_co_nerfw_f32/epoch=9.ckpt --scene_name qmt_co_nerfw_f32 \
  > experiments/r3/qmt_co_nerfw_f32_eval.log 2>&1
tail -1 experiments/r3/qmt_co_nerfw_f32_eval.log

echo "=== QUEUE3 DONE ==="
