#!/bin/bash
# Mechanism confirmation: docs/QUALITY.md attributes the co_nerfw raw-a_id-0
# failure to per-view appearance codes absorbing color deviations on a
# 40-VIEW fixture (lego has 100 train views; its codes stay near-identity).
# Prediction: with 100 train views, NeRF-W > NeRF reproduces under the
# reference's own eval convention.  Same recipe otherwise.
set -x
cd /root/repo
SCENE=/tmp/qm_scene800t100
CK=/tmp/qm_ckpts800t100
python - <<'EOF'
import sys
sys.path.insert(0, 'tests')
from fixtures import make_blender_scene
make_blender_scene('/tmp/qm_scene800t100', n_train=100, n_val=4, n_test=8,
                   size=800, texture=True)
print('100-view textured fixture ok')
EOF

COMMON="--dataset_name blender --root_dir $SCENE --img_wh 200 200 \
  --N_importance 64 --noise_std 0 --num_epochs 10 --batch_size 1024 \
  --optimizer adam --lr 5e-4 --lr_scheduler cosine --compute_dtype bfloat16 \
  --steps_per_execution 8 --save_path $CK --refresh_every 0"
EVCOMMON="--dataset_name blender --root_dir $SCENE --split test \
  --img_wh 200 200 --N_importance 64 --compute_dtype bfloat16"

run () {
  name=$1; tflags=$2; eflags=$3
  if [ ! -f $CK/qmt100_$name/epoch=9.ckpt ]; then
    timeout 5400 python train.py $COMMON --exp_name qmt100_$name $tflags \
      > experiments/r3/qmt100_${name}_train.log 2>&1
  fi
  if ! grep -q "Mean PSNR" experiments/r3/qmt100_${name}_eval.log 2>/dev/null; then
    timeout 1800 python eval.py $EVCOMMON \
      --ckpt_path $CK/qmt100_$name/epoch=9.ckpt \
      --scene_name qmt100_$name $eflags \
      > experiments/r3/qmt100_${name}_eval.log 2>&1
  fi
  tail -1 experiments/r3/qmt100_${name}_eval.log
}

run co_nerf  "--data_perturb color occ"  ""
run co_nerfw "--data_perturb color occ --encode_a --encode_t --beta_min 0.1" \
             "--encode_a --encode_t --beta_min 0.1"

echo "=== 100-VIEW SUMMARY ==="
for n in co_nerf co_nerfw; do
  echo -n "$n: "; grep "Mean PSNR" experiments/r3/qmt100_${n}_eval.log || echo MISSING
done
