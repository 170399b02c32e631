#!/bin/bash
# Round-5 TPU job A: regenerate the matfree4k operating point end-to-end via
# the CLIs and commit the eval evidence VERDICT r4 task 1 asked for.
#
#   1. MAP checkpoint (LeNet5, surrogate mnist)             -> checkpoint/map/
#   2. M=4096 stochastic_matfree inducing training (300 steps, per-step log)
#                                                           -> checkpoint/ind4k/
#   3. evaluate --predictive matfree (+ OOD fmnist)         -> results/matfree4k_eval_r5.jsonl
#   4. M=1024 twin-check checkpoint (same MAP state)        -> checkpoint/ind1k/
#   5. evaluate the M=1024 checkpoint with BOTH predictives -> results/matfree1k_crosscheck_r5.jsonl
#
# Run on the chip (env untouched), backgrounded, never timeout-killed:
#   nohup bash scripts/r5_tpu_jobA.sh > /tmp/r5_jobA.log 2>&1 &
set -u
cd /root/repo

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "1/5 MAP training"
python -m laplace_inducing_points_tpu.cli.train_scale train_map \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree4k.yml \
  || { echo "MAP FAILED rc=$?"; exit 1; }

step "2/5 M=4096 stochastic_matfree inducing (300 steps)"
python -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree4k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind4k/ \
  --train_log results/matfree4k_train_r5.jsonl \
  || { echo "IND4K FAILED rc=$?"; exit 1; }

step "3/5 evaluate M=4096 --predictive matfree (+OOD)"
python -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree4k.yml \
  --ckpt_induc checkpoint/ind4k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree4k_eval_r5.jsonl \
  || echo "EVAL4K FAILED rc=$? (continuing)"

step "4/5 M=1024 twin-check inducing (60 steps)"
python -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree1k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind1k/ \
  --train_log results/matfree1k_train_r5.jsonl \
  || { echo "IND1K FAILED rc=$?"; exit 1; }

step "5/5 evaluate M=1024: matfree vs weight on the SAME checkpoint"
python -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree1k_crosscheck_r5.jsonl \
  || echo "EVAL1K-MATFREE FAILED rc=$? (continuing)"
python -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive weight \
  --iters 3 --out_json results/matfree1k_crosscheck_r5.jsonl \
  || echo "EVAL1K-WEIGHT FAILED rc=$? (continuing)"

step "job A complete"
