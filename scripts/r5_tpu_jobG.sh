#!/bin/bash
# Round-5 TPU job G: RETRAIN the inducing sets with the precision-fixed
# matfree objective (inner CG at HIGHEST matmul precision — the pre-fix
# runs' gradients were biased by a CG stuck at residual 2-12, and the
# M=4096 trajectory in results/matfree4k_train_r5.jsonl went UP:
# loss_min == loss_first). Fresh checkpoint dirs keep the pre-fix sets
# for comparison.
#
#   1. M=1024 retrain, 60 steps  -> checkpoint/ind1k_f32/ + train_r5fix
#   2. eval the retrained M=1024 set (matfree AND weight on the same
#      checkpoint)               -> matfree1k_posttrain_r5fix
#   3. M=4096 retrain, 300 steps -> checkpoint/ind4k_f32/ + train_r5fix
#      (biggest compile-helper risk — last)
#   4. eval the retrained M=4096 set (matfree)
#                                -> matfree4k_posttrain_r5fix
#
# Run on the chip (env untouched), backgrounded, never timeout-killed:
#   nohup bash scripts/r5_tpu_jobG.sh > /tmp/r5_jobG.log 2>&1 &
set -u
cd /root/repo

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "1/4 M=1024 matfree retrain (60 steps, fixed CG)"
python -u -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree1k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind1k_f32/ \
  --train_log results/matfree1k_train_r5fix.jsonl \
  || { echo "IND1K-F32 FAILED rc=$?"; }

step "2/4 evaluate retrained M=1024 (matfree + weight)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k_f32/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree1k_posttrain_r5fix.jsonl \
  || echo "EVAL1K-F32-MATFREE FAILED rc=$? (continuing)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k_f32/ --scalable --predictive weight \
  --iters 3 --out_json results/matfree1k_posttrain_r5fix.jsonl \
  || echo "EVAL1K-F32-WEIGHT FAILED rc=$? (continuing)"

step "3/4 M=4096 matfree retrain (300 steps, fixed CG)"
python -u -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree4k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind4k_f32/ \
  --train_log results/matfree4k_train_r5fix.jsonl \
  || { echo "IND4K-F32 FAILED rc=$?"; }

step "4/5 evaluate retrained M=4096 (matfree)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree4k.yml \
  --ckpt_induc checkpoint/ind4k_f32/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree4k_posttrain_r5fix.jsonl \
  || echo "EVAL4K-F32-MATFREE FAILED rc=$? (continuing)"

step "5/5 gradient contract at M=1024 (retrained checkpoint, blocked f32 CG)"
python -u scripts/r5_precision_confirm.py \
  --ckpt_small checkpoint/ind1k_f32/ --skip_c \
  --cg_example_block 128 --n_probes 4 --powers 1 \
  --out results/precision_confirm_r5fix.jsonl \
  || echo "CONFIRM-AB FAILED rc=$? (continuing)"

step "job G complete"
