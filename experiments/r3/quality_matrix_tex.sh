#!/bin/bash
# Textured-fixture quality matrix: identical recipe to quality_matrix.sh
# (800-native 40-view ball, trained/evaled at 200^2), but the ball carries
# a spherical-coordinate checker TEXTURE.  Motivation: the smooth-gradient
# ball leaves the static/appearance color split underdetermined — the
# co_nerfw bisect (docs/QUALITY.md) showed the full a+t head set collapses
# at test poses on ANY perturbation of the texture-less fixture while each
# single head succeeds.  Lego's texture pins the static field in the
# reference table; the checker plays that role here.  Expected outcome:
# the NeRF-W > NeRF ordering on color+occ reproduces (6/6 orderings).
set -x
cd /root/repo
SCENE=/tmp/qm_scene800t
CK=/tmp/qm_ckpts800t
python - <<'EOF'
import sys
sys.path.insert(0, 'tests')
from fixtures import make_blender_scene
make_blender_scene('/tmp/qm_scene800t', n_train=40, n_val=4, n_test=8,
                   size=800, texture=True)
print('textured fixture ok')
EOF

COMMON="--dataset_name blender --root_dir $SCENE --img_wh 200 200 \
  --N_importance 64 --noise_std 0 --num_epochs 10 --batch_size 1024 \
  --optimizer adam --lr 5e-4 --lr_scheduler cosine --compute_dtype bfloat16 \
  --steps_per_execution 8 --save_path $CK --refresh_every 0"
EVCOMMON="--dataset_name blender --root_dir $SCENE --split test \
  --img_wh 200 200 --N_importance 64 --compute_dtype bfloat16"

run () {  # name, extra train flags, extra eval flags
  name=$1; tflags=$2; eflags=$3
  if [ ! -f $CK/qmt_$name/epoch=9.ckpt ]; then
    timeout 3600 python train.py $COMMON --exp_name qmt_$name $tflags \
      > experiments/r3/qmt_${name}_train.log 2>&1
  fi
  if ! grep -q "Mean PSNR" experiments/r3/qmt_${name}_eval.log 2>/dev/null; then
    timeout 1800 python eval.py $EVCOMMON --ckpt_path $CK/qmt_$name/epoch=9.ckpt \
      --scene_name qmt_$name $eflags \
      > experiments/r3/qmt_${name}_eval.log 2>&1
  fi
  tail -1 experiments/r3/qmt_${name}_eval.log
}

run clean       ""                                               ""
run color_nerf  "--data_perturb color"                           ""
run color_nerfa "--data_perturb color --encode_a"                "--encode_a"
run occ_nerf    "--data_perturb occ"                             ""
run occ_nerfu   "--data_perturb occ --encode_t --beta_min 0.1"   "--encode_t --beta_min 0.1"
run co_nerf     "--data_perturb color occ"                       ""
run co_nerfw    "--data_perturb color occ --encode_a --encode_t --beta_min 0.1" "--encode_a --encode_t --beta_min 0.1"

echo "=== TEXTURED SUMMARY ==="
for n in clean color_nerf color_nerfa occ_nerf occ_nerfu co_nerf co_nerfw; do
  echo -n "$n: "; grep "Mean PSNR" experiments/r3/qmt_${n}_eval.log || echo "MISSING"
done
