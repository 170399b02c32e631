"""Round-5 compile-cliff probe: find WHERE the remote chipless compile
helper SIGKILLs on HIGHEST-precision W-factor graphs.

Observed so far (results/precision_confirm_r5*.jsonl): every graph holding
a HIGHEST-precision LeNet5 W factor at M=1024+ dies in ~20 s — including
the minimal staged ``_probe_lam_max`` (ONE factor, one fori_loop) — while
DEFAULT-precision monoliths up to M=4096 compile fine (24 min). This
script bisects the failure along three axes with fail-fast guarded jits:

  * batch size M:      128 / 256 / 512 / 1024
  * graph content:     single jvp | single Gram matvec (jvp+vjp) |
                       30-step power iteration
  * precision:         highest | high (bf16x3) | default (control)

Each probe compiles + runs one tiny application and records ok/seconds.
The envelope tells us whether an example-blocked HIGHEST matvec (lax.map
over chunks that DO compile) can replace the monolithic one.

Usage (TPU, chip free):
    nohup python -u scripts/r5_compile_cliff.py \
        --out results/compile_cliff_r5.jsonl > /tmp/r5_cliff.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/scale/lenet5_mnist_matfree4k.yml")
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--ms", type=int, nargs="+", default=[128, 256, 512, 1024])
    p.add_argument("--blocked", nargs="+",
                   default=["1024:128", "1024:256", "4096:256"],
                   help="M:block pairs for the blocked-factor probes")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from laplace_inducing_points_tpu.utils import (acquire_tpu_lock,
                                                   setup_compile_cache)
    setup_compile_cache()
    acquire_tpu_lock()
    log(f"[cliff] devices: {jax.devices()}")

    from laplace_inducing_points_tpu.core import operators as ops
    from laplace_inducing_points_tpu.data.scale import get_dataloaders
    from laplace_inducing_points_tpu.models.registry import get_model
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.utils.checkpoint import load_train_state
    from laplace_inducing_points_tpu.utils.config import load_experiment_config

    cfg = load_experiment_config(args.config)
    model = get_model(cfg["model"])
    train_loader, *_ = get_dataloaders(args.dataset, 256, aug=False)
    x_all = np.asarray(train_loader.dataset.x, dtype=np.float32)

    state = create_train_state(model,
                               jax.random.PRNGKey(cfg["model"].get("seed", 0)),
                               jnp.asarray(x_all[:1]), optax.adam(1e-3),
                               model_kind=cfg["model"]["type"])
    state = load_train_state(
        state, os.path.join(args.ckpt_map, f"map_{args.dataset}"))
    log(f"[cliff] MAP checkpoint loaded (step {int(state.step)})")

    first = True

    def record(**kw):
        nonlocal first
        log("[cliff] " + json.dumps(kw))
        if args.out:
            with open(args.out, "w" if first else "a") as f:
                f.write(json.dumps(kw) + "\n")
        first = False

    def probe(what, M, precision, fn):
        t0 = time.time()
        try:
            out = fn()
            jax.block_until_ready(out)
            record(op="compile_probe", what=what, M=M, precision=precision,
                   ok=True, seconds=round(time.time() - t0, 1))
            return True
        except Exception as e:  # noqa: BLE001 — survive helper SIGKILL
            record(op="compile_probe", what=what, M=M, precision=precision,
                   ok=False, seconds=round(time.time() - t0, 1),
                   error=f"{type(e).__name__}: {e}"[:200])
            return False

    # jit factories — state/Z/u as arguments (never closure constants)
    @jax.jit
    def jvp_hi(state, Z, u):
        wz = ops.make_w_factor(state, Z, matmul_precision="highest")
        return wz.matvec(u)

    @jax.jit
    def gram_hi(state, Z, u):
        wz = ops.make_w_factor(state, Z, matmul_precision="highest")
        Mk, Kk = wz.inner_shape
        return wz.t_matvec(wz.matvec(u.reshape(Mk, Kk)))

    @jax.jit
    def gram_high(state, Z, u):
        wz = ops.make_w_factor(state, Z, matmul_precision="high")
        Mk, Kk = wz.inner_shape
        return wz.t_matvec(wz.matvec(u.reshape(Mk, Kk)))

    @jax.jit
    def gram_def(state, Z, u):
        wz = ops.make_w_factor(state, Z)
        Mk, Kk = wz.inner_shape
        return wz.t_matvec(wz.matvec(u.reshape(Mk, Kk)))

    @partial(jax.jit, static_argnames=("blk",))
    def gram_hi_blocked(state, Z, u, blk):
        wz = ops.make_w_factor_blocked(state, Z, example_block=blk,
                                       matmul_precision="highest")
        Mk, Kk = wz.inner_shape
        return wz.t_matvec(wz.matvec(u.reshape(Mk, Kk)))

    @partial(jax.jit, static_argnames=("blk",))
    def power_hi_blocked(state, Z, u, blk):
        wz = ops.make_w_factor_blocked(state, Z, example_block=blk,
                                       matmul_precision="highest")
        Mk, Kk = wz.inner_shape
        d = Mk * Kk
        mv = lambda v: wz.t_matvec(wz.matvec(v.reshape(Mk, Kk))).reshape(d)
        v = jax.lax.fori_loop(
            0, 30,
            lambda _, v: (lambda w: w / jnp.maximum(jnp.linalg.norm(w),
                                                    1e-30))(mv(v)),
            u / jnp.linalg.norm(u))
        return jnp.vdot(v, mv(v))

    @jax.jit
    def power_hi(state, Z, u):
        wz = ops.make_w_factor(state, Z, matmul_precision="highest")
        Mk, Kk = wz.inner_shape
        d = Mk * Kk
        mv = lambda v: wz.t_matvec(wz.matvec(v.reshape(Mk, Kk))).reshape(d)
        v = jax.lax.fori_loop(
            0, 30,
            lambda _, v: (lambda w: w / jnp.maximum(jnp.linalg.norm(w),
                                                    1e-30))(mv(v)),
            u / jnp.linalg.norm(u))
        return jnp.vdot(v, mv(v))

    key = jax.random.PRNGKey(0)
    cliff = None            # smallest M where the monolithic HIGHEST dies
    for M in args.ms:
        Z = jnp.asarray(x_all[:M])
        d = M * 10
        u_w = jax.random.normal(key, (M, 10))
        u_d = jax.random.normal(key, (d,))
        ok_g = probe("gram_matvec", M, "highest",
                     lambda: gram_hi(state, Z, u_d))
        if ok_g:
            probe("power30", M, "highest", lambda: power_hi(state, Z, u_d))
        else:
            cliff = cliff or M
            probe("jvp_only", M, "highest", lambda: jvp_hi(state, Z, u_w))
            probe("gram_matvec", M, "high",
                  lambda: gram_high(state, Z, u_d))
            probe("gram_matvec", M, "default",
                  lambda: gram_def(state, Z, u_d))

    # blocked-factor probes: can a lax.map/scan over sub-cliff blocks carry
    # HIGHEST to M beyond the monolith's cliff?
    for M, blk in [tuple(int(v) for v in s.split(":")) for s in args.blocked]:
        Z = jnp.asarray(x_all[:M])
        u_d = jax.random.normal(key, (M * 10,))
        ok = probe(f"gram_blocked{blk}", M, "highest",
                   lambda: gram_hi_blocked(state, Z, u_d, blk))
        if ok:
            probe(f"power30_blocked{blk}", M, "highest",
                  lambda: power_hi_blocked(state, Z, u_d, blk))

    log("[cliff] DONE")


if __name__ == "__main__":
    main()
