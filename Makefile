# laplace_inducing_points_tpu — build/run harness
# CPU work must bypass the axon remote-compile plugin (see
# .claude/skills/verify/SKILL.md); TPU targets keep the env untouched.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
PY      := python

.PHONY: test test-fast bench toy-banana toy-sine toy-xor toy-spiral \
	scale-mnist eval-mnist dryrun data-import

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x

bench:
	$(PY) bench.py

# ---- toy pipelines (CPU-friendly) -----------------------------------------
toy-banana:
	$(CPU_ENV) $(PY) -m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
		--dataset banana --config configs/toy/classifier_banana.yml --plot_Z --plot_X

toy-xor:
	$(CPU_ENV) $(PY) -m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
		--dataset xor --config configs/toy/classifier_xor.yml --plot_Z

toy-sine:
	$(CPU_ENV) $(PY) -m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
		--dataset sine --config configs/toy/regressor_sine.yml

# ---- scale pipelines (TPU) -------------------------------------------------
scale-mnist:
	$(PY) -m laplace_inducing_points_tpu.cli.train_scale full_pipeline \
		--dataset mnist --config configs/scale/lenet5_mnist.yml

eval-mnist:
	$(PY) -m laplace_inducing_points_tpu.cli.evaluate \
		--dataset mnist --ood-dataset fmnist \
		--config configs/scale/lenet5_mnist.yml --scalable

# ---- multi-chip dry-run on virtual CPU mesh --------------------------------
# the scheduler flag serializes per-device collective order — without it
# XLA:CPU's in-process rendezvous deadlocks ~50% of runs (see verify skill)
dryrun:
	$(CPU_ENV) XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_enable_concurrency_optimized_scheduler=false" \
		$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"

# ---- real-data import (zero-egress environment) ----------------------------
# Drop the official files in SRC (mnist/fmnist: the four IDX .gz files;
# cifar10: cifar-10-python.tar.gz), then e.g.:
#   make data-import DATASET=mnist SRC=/path/to/downloads
# Structural IDX validation always; published-MD5 check (STRICT=--strict to
# enforce). Installs where the training CLIs read from (data/).
DATASET ?= mnist
SRC     ?= /tmp/downloads
STRICT  ?=
data-import:
	$(CPU_ENV) $(PY) -m laplace_inducing_points_tpu.cli.import_data \
		--dataset $(DATASET) --src $(SRC) --root data $(STRICT)

# ---- native data engine ----------------------------------------------------
native: native/liblip_data.so

native/liblip_data.so: native/lip_data.cpp
	g++ -O3 -march=native -shared -fPIC -o $@ $<

toy-spiral:
	$(CPU_ENV) $(PY) -m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
		--dataset spiral --config configs/toy/classifier_spiral.yml --plot_Z --plot_X

# ---- remote-attach debugging (parity: reference Makefile debug_run) --------
# requires debugpy; attach your editor to localhost:5678
debug-toy:
	$(CPU_ENV) nohup $(PY) -m debugpy --listen 5678 --wait-for-client \
		-m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
		--dataset banana --config configs/toy/classifier_banana.yml \
		> debug.log 2>&1 & echo "debugpy waiting on :5678"
