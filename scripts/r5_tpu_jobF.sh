#!/bin/bash
# Round-5 TPU job F: post-precision-fix evaluations on the EXISTING
# checkpoints (same MAP state, same inducing sets as the pre-fix rows in
# results/matfree{1k_crosscheck,4k_eval}_r5.jsonl — the deltas isolate
# what the broken bf16 inner CG cost each predictive).
#
#   1. M=1024 weight-path eval — previously IMPOSSIBLE on the chip: the
#      device QDWH-eig at d_z=10,240 OOMed HBM (17.73G > 15.75G, jobA2);
#      now runs via the host-LAPACK eigh fallback.        -> crosscheck_r5fix
#   2. M=1024 matfree eval, fixed CG (pre-fix worst residual 3.93)
#                                                         -> crosscheck_r5fix
#   3. M=4096 matfree eval, fixed CG (pre-fix worst residual 1.76)
#                                                         -> matfree4k_eval_r5fix
#
# Run on the chip (env untouched), backgrounded, never timeout-killed:
#   nohup bash scripts/r5_tpu_jobF.sh > /tmp/r5_jobF.log 2>&1 &
set -u
cd /root/repo

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "1/3 evaluate M=1024 --predictive weight (host-eigh fallback)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive weight \
  --iters 3 --out_json results/matfree1k_crosscheck_r5fix.jsonl \
  || echo "EVAL1K-WEIGHT FAILED rc=$? (continuing)"

step "2/3 evaluate M=1024 --predictive matfree (fixed CG)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree1k.yml \
  --ckpt_induc checkpoint/ind1k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree1k_crosscheck_r5fix.jsonl \
  || echo "EVAL1K-MATFREE FAILED rc=$? (continuing)"

step "3/3 evaluate M=4096 --predictive matfree (fixed CG)"
python -u -m laplace_inducing_points_tpu.cli.evaluate \
  --dataset mnist --ood-dataset fmnist \
  --config configs/scale/lenet5_mnist_matfree4k.yml \
  --ckpt_induc checkpoint/ind4k/ --scalable --predictive matfree \
  --iters 3 --out_json results/matfree4k_eval_r5fix.jsonl \
  || echo "EVAL4K-MATFREE FAILED rc=$? (continuing)"

step "job F complete"
