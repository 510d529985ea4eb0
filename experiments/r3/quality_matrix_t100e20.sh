#!/bin/bash
# The definitive fixture matrix: README recipes at the reference's own
# scale knobs — 100 train views (lego's count), checker texture, 20 epochs
# (README.md:53-77 trains 20) — plus plain-NeRF controls.  Fresh runs (no
# resume) so each arm sees the canonical 20-epoch cosine schedule.
# SEQUENTIAL — one TPU process at a time.
set -x
cd /root/repo
SCENE=/tmp/qm_scene800t100
CK=/tmp/qm_ckpts800t100
python - <<'EOF'
import os, sys
sys.path.insert(0, 'tests')
from fixtures import make_blender_scene
if not os.path.exists('/tmp/qm_scene800t100/transforms_train.json'):
    make_blender_scene('/tmp/qm_scene800t100', n_train=100, n_val=4,
                       n_test=8, size=800, texture=True)
print('fixture ok')
EOF

COMMON="--dataset_name blender --root_dir $SCENE --img_wh 200 200 \
  --N_importance 64 --noise_std 0 --num_epochs 20 --batch_size 1024 \
  --optimizer adam --lr 5e-4 --lr_scheduler cosine --compute_dtype bfloat16 \
  --steps_per_execution 8 --save_path $CK --refresh_every 0"
EVCOMMON="--dataset_name blender --root_dir $SCENE --split test \
  --img_wh 200 200 --N_importance 64 --compute_dtype bfloat16"

run () {
  name=$1; tflags=$2; eflags=$3
  if [ ! -f $CK/e20_$name/epoch=19.ckpt ]; then
    timeout 7200 python train.py $COMMON --exp_name e20_$name $tflags \
      > experiments/r3/e20_${name}_train.log 2>&1
  fi
  if ! grep -q "Mean PSNR" experiments/r3/e20_${name}_eval.log 2>/dev/null; then
    timeout 1800 python eval.py $EVCOMMON \
      --ckpt_path $CK/e20_$name/epoch=19.ckpt \
      --scene_name e20_$name $eflags \
      > experiments/r3/e20_${name}_eval.log 2>&1
  fi
  tail -1 experiments/r3/e20_${name}_eval.log
}

run clean       ""                                               ""
run color_nerf  "--data_perturb color"                           ""
run color_nerfa "--data_perturb color --encode_a"                "--encode_a"
run occ_nerf    "--data_perturb occ"                             ""
run occ_nerfu   "--data_perturb occ --encode_t --beta_min 0.1"   "--encode_t --beta_min 0.1"
run co_nerf     "--data_perturb color occ"                       ""
run co_nerfw    "--data_perturb color occ --encode_a --encode_t --beta_min 0.1" \
                "--encode_a --encode_t --beta_min 0.1"

# the paper-protocol arm for the W model
timeout 1800 python eval.py $EVCOMMON \
  --ckpt_path $CK/e20_co_nerfw/epoch=19.ckpt --scene_name e20_co_nerfw_opta \
  --encode_a --encode_t --beta_min 0.1 --optimize_appearance \
  > experiments/r3/e20_co_nerfw_opta_eval.log 2>&1

echo "=== E20/T100 SUMMARY ==="
for n in clean color_nerf color_nerfa occ_nerf occ_nerfu co_nerf co_nerfw co_nerfw_opta; do
  echo -n "$n: "; grep "Mean PSNR" experiments/r3/e20_${n}_eval.log || echo MISSING
done
