#!/bin/bash
# Resume of scripts/r5_tpu_jobA.sh from step 2 (MAP checkpoint already
# saved; step 2 died on a mid-import source edit race, see /tmp/r5_jobA.log).
set -u
cd /root/repo
step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "2/5 M=4096 stochastic_matfree inducing (300 steps)"
python -u -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree4k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind4k/ \
  --train_log results/matfree4k_train_r5.jsonl \
  || { echo "IND4K FAILED rc=$?"; exit 1; }

step "3/5 evaluate M=4096 --predictive matfree (+OOD)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree4k.yml \
  --ckpt_induc checkpoint/ind4k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree4k_eval_r5.jsonl \
  || echo "EVAL4K FAILED rc=$? (continuing)"

step "4/5 M=1024 twin-check inducing (60 steps)"
python -u -m laplace_inducing_points_tpu.cli.train_scale train_inducing \
  --dataset mnist --config configs/scale/lenet5_mnist_matfree1k.yml \
  --alpha_ip 50 --ckpt_induc checkpoint/ind1k/ \
  --train_log results/matfree1k_train_r5.jsonl \
  || { echo "IND1K FAILED rc=$?"; exit 1; }

step "5/5 evaluate M=1024: matfree vs weight on the SAME checkpoint"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree1k_crosscheck_r5.jsonl \
  || echo "EVAL1K-MATFREE FAILED rc=$? (continuing)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive weight \
  --iters 3 --out_json results/matfree1k_crosscheck_r5.jsonl \
  || echo "EVAL1K-WEIGHT FAILED rc=$? (continuing)"

step "job A complete"
