#!/bin/bash
# Bisect the qm8_co_nerfw test-pose collapse: does the full NeRF-W head set
# (encode_a + encode_t + beta) collapse on color-only data, occ-only data,
# or only on color+occ?  Same recipe as quality_matrix.sh (10 epochs, 200^2,
# b1024, bf16, K=8).  Runs SEQUENTIALLY (one TPU process at a time).
set -x
cd /root/repo
SCENE=/tmp/qm_scene800
CK=/tmp/qm_ckpts800

COMMON="--dataset_name blender --root_dir $SCENE --img_wh 200 200 \
  --N_importance 64 --noise_std 0 --num_epochs 10 --batch_size 1024 \
  --optimizer adam --lr 5e-4 --lr_scheduler cosine --compute_dtype bfloat16 \
  --steps_per_execution 8 --save_path $CK --refresh_every 0"
EVCOMMON="--dataset_name blender --root_dir $SCENE --split test \
  --img_wh 200 200 --N_importance 64 --compute_dtype bfloat16"

run () {  # name, extra train flags, extra eval flags
  name=$1; tflags=$2; eflags=$3
  if [ ! -f $CK/qm8_$name/epoch=9.ckpt ]; then
    python train.py $COMMON --exp_name qm8_$name $tflags \
      > experiments/r3/qm8_${name}_train.log 2>&1
  fi
  if ! grep -q "Mean PSNR" experiments/r3/qm8_${name}_eval.log 2>/dev/null; then
    python eval.py $EVCOMMON --ckpt_path $CK/qm8_$name/epoch=9.ckpt \
      --scene_name qm8_$name $eflags \
      > experiments/r3/qm8_${name}_eval.log 2>&1
  fi
  tail -1 experiments/r3/qm8_${name}_eval.log
}

# Arm A: color-only data, full NeRF-W heads
run color_nerfw "--data_perturb color --encode_a --encode_t --beta_min 0.1" \
                "--encode_a --encode_t --beta_min 0.1"
# Arm B: occ-only data, full NeRF-W heads
run occ_nerfw   "--data_perturb occ --encode_a --encode_t --beta_min 0.1" \
                "--encode_a --encode_t --beta_min 0.1"
# Arm C: color+occ data, encode_t only (NeRF-U on color+occ)
run co_nerfu    "--data_perturb color occ --encode_t --beta_min 0.1" \
                "--encode_t --beta_min 0.1"

echo "=== BISECT SUMMARY ==="
for n in color_nerfw occ_nerfw co_nerfu; do
  echo -n "$n: "; grep "Mean PSNR" experiments/r3/qm8_${n}_eval.log || echo MISSING
done
