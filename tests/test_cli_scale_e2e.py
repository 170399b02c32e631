"""End-to-end scale-CLI test: micro train_scale full_pipeline + evaluate.

Pins the pipeline contract the round-2 review found broken: train_scale
must persist the alpha its Z was trained for (run meta), and evaluate must
pick it up via the 'pipeline meta' precedence — otherwise scale runs
silently evaluate at the config's MAP-prior alpha.
"""

import json
import os

import pytest
import yaml


@pytest.fixture()
def micro_scale_config(tmp_path):
    cfg = {
        "model": {"name": "LeNet5", "type": "classifier", "seed": 7},
        "optimization": {
            "alpha": 0.005,
            "full_set_size": 4096,
            "map": {"batch_size": 256, "epochs": 1, "lr": 1e-3,
                    "seed": 1, "schedule": "cosine"},
            "ip": {"m": 8, "batch_size": 32, "epochs": 3, "lr": 0.01,
                   "mc_samples": 8, "seed": 2, "st_samples": 8,
                   "slq_samples": 1, "slq_num_matvecs": 4,
                   "objective": "gram"},
        },
        "sampling": {"mc_samples": 8, "method": "gram_eigh",
                     "predictive": "cov"},
    }
    path = tmp_path / "micro_scale.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_train_scale_then_evaluate_roundtrip(micro_scale_config, tmp_path,
                                             monkeypatch, capsys):
    from laplace_inducing_points_tpu.cli import evaluate, train_scale

    monkeypatch.chdir(tmp_path)
    train_scale.main([
        "full_pipeline", "--dataset", "mnist",
        "--config", micro_scale_config,
        "--alpha_ip", "25.0",
        "--ckpt_map", str(tmp_path / "ckpt_map"),
        "--ckpt_induc", str(tmp_path / "ckpt_ind"),
        "--data_dir", str(tmp_path / "data"),
        "--profile", str(tmp_path / "trace_train"),
    ])
    out = capsys.readouterr().out
    assert "[DONE] MAP training." in out
    assert "[DONE] Inducing training" in out
    # --profile must leave a TensorBoard-loadable trace of the inducing phase
    assert "[profile] device trace written" in out
    trace_files = [f for _, _, fs in os.walk(tmp_path / "trace_train")
                   for f in fs]
    assert any(f.endswith(".xplane.pb") for f in trace_files), trace_files

    # the run meta must record the alpha the Z was trained for
    meta_path = tmp_path / "ckpt_ind" / "ind_mnist_meta.json"
    assert meta_path.exists(), os.listdir(tmp_path / "ckpt_ind")
    meta = json.loads(meta_path.read_text())
    assert meta["alpha_ip"] == 25.0 and meta["alpha_src"] == "cli"

    # evaluate must pick the pipeline alpha, NOT the config's MAP prior
    evaluate.main([
        "--dataset", "mnist", "--config", micro_scale_config,
        "--scalable", "--iters", "1", "--max_batches", "1",
        "--ckpt_map", str(tmp_path / "ckpt_map"),
        "--ckpt_induc", str(tmp_path / "ckpt_ind"),
        "--data_dir", str(tmp_path / "data"),
        "--out_json", str(tmp_path / "eval.jsonl"),
        "--profile", str(tmp_path / "trace_eval"),
    ])
    out = capsys.readouterr().out
    trace_files = [f for _, _, fs in os.walk(tmp_path / "trace_eval")
                   for f in fs]
    assert any(f.endswith(".xplane.pb") for f in trace_files), trace_files
    assert "alpha=25.0 (pipeline meta)" in out
    assert "predictive method: cov" in out
    rec = json.loads((tmp_path / "eval.jsonl").read_text().splitlines()[0])
    assert rec["alpha"] == 25.0
    assert 0.0 <= rec["acc"] <= 1.0
