"""End-to-end banana variance measurement (round 4, VERDICT r3 item 5).

Round 3 diagnosed the 76–83% OOD-AUROC scatter of fresh banana pipeline
reruns as the seed-to-seed multi-modality of the inducing-KL Z landscape
(RESULTS.md "Banana round 3") but shipped no mechanism. Round 4's mechanism
is k-restart Z training selected by exact full-set KL
(``training/inducing.py::train_inducing_points_restarts``), on by default
in the toy configs (``restarts: 4``). This script MEASURES it: one shared
MAP fit, then ``--n_seeds`` independent Z trainings (fresh rng via
``main_toy --ip_seed``) each evaluated at the like-for-like operating point
(ring OOD radius 1.05, MC from the config), with and without restarts.

Writes one JSON line per (seed, variant) to ``--out``; the RESULTS.md
"Banana round 4" scatter table is generated from those rows.

Usage (CPU):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/banana_scatter.py \
        --n_seeds 8 --out results/banana_r4_scatter.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str]) -> str:
    print("[scatter] $", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"command failed rc={proc.returncode}")
    return proc.stdout


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_seeds", type=int, default=8)
    p.add_argument("--config", default="configs/toy/classifier_banana.yml")
    p.add_argument("--ood_radius", type=float, default=1.05)
    p.add_argument("--restarts", type=int, nargs="+", default=[4, 1],
                   help="restart counts to measure (4 = the round-4 "
                        "default mechanism; 1 = the round-3 single-run "
                        "baseline for the same seeds)")
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--out", default="results/banana_r4_scatter.jsonl")
    args = p.parse_args()

    py = [sys.executable, "-m"]
    # one shared MAP fit (the scatter under study is Z-training variance;
    # the MAP seed is config-fixed, matching the round-3 methodology)
    run(py + ["laplace_inducing_points_tpu.cli.main_toy", "train_map",
              "--dataset", "banana", "--config", args.config])

    rows = []
    with open(args.out, "w") as f:
        pass
    for n_restarts in args.restarts:
        for seed in range(args.n_seeds):
            ip_seed = 1000 + 7919 * seed
            t0 = time.time()
            run(py + ["laplace_inducing_points_tpu.cli.main_toy",
                      "train_inducing", "--dataset", "banana",
                      "--config", args.config,
                      "--ip_seed", str(ip_seed),
                      "--restarts", str(n_restarts)])
            t_train = time.time() - t0
            with tempfile.NamedTemporaryFile(suffix=".jsonl",
                                             delete=False) as tf:
                tmp = tf.name
            run(py + ["laplace_inducing_points_tpu.cli.evaluate",
                      "--dataset", "banana", "--config", args.config,
                      "--scalable", "--ood-dataset", "ring",
                      "--ood_ring_radius", str(args.ood_radius),
                      "--iters", str(args.iters), "--out_json", tmp])
            with open(tmp) as fh:
                evals = [json.loads(l) for l in fh if l.strip()]
            os.unlink(tmp)
            best = evals[-1]  # warm repetition
            row = {"seed": ip_seed, "restarts": n_restarts,
                   "ood_radius": args.ood_radius,
                   "nll": best["nll"], "acc": best["acc"],
                   "ece": best["ece"], "brier": best["brier"],
                   "ood_auroc": best["ood_auroc"],
                   "train_s": round(t_train, 1)}
            rows.append(row)
            print("[scatter] " + json.dumps(row), flush=True)
            with open(args.out, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    for n_restarts in args.restarts:
        aurocs = [r["ood_auroc"] for r in rows
                  if r["restarts"] == n_restarts]
        if aurocs:
            print(f"[scatter] restarts={n_restarts}: AUROC@r"
                  f"{args.ood_radius} min={min(aurocs):.3f} "
                  f"max={max(aurocs):.3f} "
                  f"mean={sum(aurocs) / len(aurocs):.3f} "
                  f"(n={len(aurocs)})", flush=True)


if __name__ == "__main__":
    main()
