"""End-to-end CLI test: micro full_pipeline run through main_toy.main()."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture()
def micro_config(tmp_path):
    cfg = {
        "model": {"name": "classifier", "type": "classifier",
                  "num_h": 6, "num_l": 1, "num_c": 2, "seed": 1},
        "data": {"n": 96, "noise": 0.05, "seed": 3},
        "optimization": {
            "full_set_size": 76,
            "alpha": 0.01,
            "map": {"batch_size": 16, "epochs": 8, "lr": 0.03, "seed": 2},
            "ip": {"m": 6, "batch_size": 16, "epochs": 4, "lr": 0.05,
                   "mc_samples": 8, "seed": 4, "st_samples": 16,
                   "slq_samples": 1, "slq_num_matvecs": 4,
                   "objective": "gram", "restarts": 2,
                   "alpha_train": 0.5},
        },
    }
    path = tmp_path / "micro.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_full_pipeline_cli(micro_config, tmp_path, monkeypatch, capsys):
    from laplace_inducing_points_tpu.cli import main_toy

    monkeypatch.chdir(tmp_path)
    main_toy.main([
        "full_pipeline", "--dataset", "banana", "--config", micro_config,
        "--alpha_ip", "0.05", "--plot_Z",
        "--ckpt_map", str(tmp_path / "ckpt_map"),
        "--ckpt_induc", str(tmp_path / "ckpt_ind"),
        "--fig_dir", str(tmp_path / "fig"),
        "--data_dir", str(tmp_path / "data"),
    ])
    out = capsys.readouterr().out
    assert "[DONE] MAP training." in out
    assert "[DONE] Inducing training." in out
    assert "inducing restarts] selected KL" in out   # k-restart path ran
    # alpha_train decouples the Z-training landscape from the eval alpha
    assert "Z-training at alpha_train=0.5" in out
    import json
    meta = json.load(open(tmp_path / "ckpt_ind" / "ind_banana_meta.json"))
    assert meta["alpha_train"] == 0.5
    assert meta["alpha_ip"] == 0.05   # eval alpha untouched
    assert "[DONE] Visualization." in out
    figs = os.listdir(tmp_path / "fig")
    assert any("lla_ip" in f for f in figs)
    assert os.path.exists(tmp_path / "ckpt_ind" / "ind_banana_4.npz")

    # visualize-only mode restores from the checkpoints just written
    main_toy.main([
        "visualize", "--dataset", "banana", "--config", micro_config,
        "--alpha_ip", "0.05",
        "--ckpt_map", str(tmp_path / "ckpt_map"),
        "--ckpt_induc", str(tmp_path / "ckpt_ind"),
        "--fig_dir", str(tmp_path / "fig2"),
        "--data_dir", str(tmp_path / "data"),
    ])
    assert os.listdir(tmp_path / "fig2")


def test_map_restarts_cli(micro_config, tmp_path, monkeypatch, capsys):
    """--map_restarts trains k MAP candidates and keeps the val-NLL best;
    --map_alpha_factor strengthens only the MAP prior (round-5 MAP-axis
    study mechanism, RESULTS.md 'Banana round 5')."""
    from laplace_inducing_points_tpu.cli import main_toy

    monkeypatch.chdir(tmp_path)
    main_toy.main([
        "train_map", "--dataset", "banana", "--config", micro_config,
        "--map_restarts", "2", "--map_alpha_factor", "2",
        "--ckpt_map", str(tmp_path / "ckpt_map"),
        "--fig_dir", str(tmp_path / "fig"),
        "--data_dir", str(tmp_path / "data"),
    ])
    out = capsys.readouterr().out
    assert "[map] 2 restarts (alpha_factor=2.0) val NLLs" in out
    assert "[DONE] MAP training." in out
    assert os.path.exists(tmp_path / "ckpt_map" / "map_banana")


def test_make_data_cli(tmp_path, monkeypatch):
    from laplace_inducing_points_tpu.cli import make_data

    monkeypatch.chdir(tmp_path)
    make_data.main(["--dataset", "spiral", "--n_samples", "32",
                    "--seed", "9", "--out_file", str(tmp_path / "s.npz")])
    d = np.load(tmp_path / "s.npz")
    assert d["x"].shape == (32, 2)


def test_mnist_pca_subset(tmp_path):
    from laplace_inducing_points_tpu.data.toy import mnist_pca_subset

    x, y = mnist_pca_subset(data_dir=str(tmp_path), max_per_class=50)
    assert x.shape[1] == 2
    assert set(np.unique(np.asarray(y))) <= {0, 1}
    assert abs(float(np.asarray(x).std()) - 1.0) < 0.3
