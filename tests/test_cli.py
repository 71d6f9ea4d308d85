"""CLI smoke tests: worker model families + monitorer matrix, tiny configs."""

import os

import numpy as np
import pytest

from gn_ode_sir_tpu.cli import monitorer, worker

KARATE = "/root/reference/real_graphs/karate"

pytestmark = pytest.mark.skipif(
    not os.path.exists(KARATE + ".pkl"), reason="reference graphs unavailable"
)


def _base_argv(tmp_path, model="ode_nn", extra=()):
    return [
        "--dataset", KARATE, "--model", model, "--hidden", "8",
        "--epochs", "2", "--lr", "1e-3", "--batch_size", "4",
        "--sim", "100", "--maxTime", "8",
        "--I_indices", "[25, 18]", "[1, 27]", "[16, 27]", "[4, 9]", "[2, 30]",
        "--beta", "0.47", "0.26", "0.23", "0.3", "0.41",
        "--gamma", "0.31", "0.33", "0.2", "0.25", "0.44",
        "--path_to_save", str(tmp_path), "--log_every", "10", *extra,
    ]


def test_parse_i_indices_forms():
    assert worker.parse_i_indices(["[25, 18]", "3", "1,2"]) == [[25, 18], [3], [1, 2]]


@pytest.mark.parametrize("spmm", ["dense", "coo", "ell"])
def test_worker_spmm_backends(tmp_path, spmm):
    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=("--spmm", spmm)))
    assert rc == 0


@pytest.mark.parametrize("model", ["ode_nn", "GCN", "GIN", "dmp", "rk"])
def test_worker_all_model_families(tmp_path, model):
    rc = worker.main(_base_argv(tmp_path, model))
    assert rc == 0
    csv = tmp_path / "Metrics-trials-karate"
    assert csv.exists()
    # label cache + trial params persisted (reference contract)
    assert (tmp_path / "initial-seed.pkl").exists()
    assert any(p.name.startswith("karate-S-") for p in tmp_path.iterdir())


def test_worker_node_split(tmp_path):
    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--node_split"]))
    assert rc == 0


def test_worker_multigraph(tmp_path):
    argv = [
        "--dataset", "/root/reference/real_graphs/karate+dolphins",
        "--model", "ode_nn", "--hidden", "8", "--epochs", "2", "--lr", "1e-3",
        "--batch_size", "4", "--sim", "100", "--maxTime", "8",
        "--instances_per_graph", "4", "6",
        "--path_to_save", str(tmp_path), "--log_every", "10", "--seed", "1",
    ]
    rc = worker.main(argv)
    assert rc == 0
    assert (tmp_path / "Experiments-seed2-dolphins").is_dir()
    assert (tmp_path / "Metrics-trials-karate+dolphins").exists()

    # per-graph trial params are persisted (reference initial-*.pkl layout,
    # ode_nn_ngraphs.py:326-328) and a repeat run with a DIFFERENT sampling
    # seed + init seed reuses them — repeats train on identical trials
    import pickle

    beta_pkl = tmp_path / "Experiments-seed2-dolphins" / "initial-beta.pkl"
    assert beta_pkl.exists()
    betas_first = pickle.load(open(beta_pkl, "rb"))
    assert len(betas_first) >= 6
    rc = worker.main(argv[:-1] + ["7", "--init_seed", "9"])
    assert rc == 0
    assert pickle.load(open(beta_pkl, "rb")) == betas_first


@pytest.mark.parametrize("model", ["GCN", "GIN"])
def test_worker_multigraph_gnn_baselines(tmp_path, model):
    """GCN/GIN down the '+'-dataset path (gnn_ngraphs.py protocol), with
    --resume passed as the retry chains do (a no-op without a checkpoint)."""
    argv = [
        "--dataset", "/root/reference/real_graphs/karate+dolphins",
        "--model", model, "--hidden", "8", "--epochs", "2", "--lr", "1e-3",
        "--batch_size", "4", "--sim", "100", "--maxTime", "8",
        "--instances_per_graph", "4", "6",
        "--path_to_save", str(tmp_path), "--log_every", "10", "--seed", "1",
        "--init_seed", "0", "--trial", "1", "--resume",
    ]
    rc = worker.main(argv)
    assert rc == 0
    csv = tmp_path / "Metrics-trials-karate+dolphins"
    assert csv.exists() and f",{model}," in csv.read_text()


def test_worker_config_json(tmp_path):
    """--config supplies defaults; explicit flags still win."""
    import json

    cfg = {
        "model": "ode_nn", "hidden": 8, "lr": 1e-3, "epochs": 2,
        "batch_size": 4, "sim": 100, "max_time": 8, "dataset": KARATE,
        "path_to_save": str(tmp_path),
        "i_indices": [[25, 18], [1, 27], [16, 27], [4, 9], [2, 30]],
        "beta": [0.47, 0.26, 0.23, 0.3, 0.41],
        "gamma": [0.31, 0.33, 0.2, 0.25, 0.44],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = worker.main(["--config", str(cfg_path), "--log_every", "10"])
    assert rc == 0
    assert (tmp_path / "Metrics-trials-karate").exists()
    # explicit flag overrides the config value
    rc = worker.main(["--config", str(cfg_path), "--epochs", "1",
                      "--path_to_save", str(tmp_path / "o2"), "--log_every", "10"])
    assert rc == 0


def test_worker_out_of_dist_csvs(tmp_path):
    """--out_of_dist writes BOTH reference CSVs (ode_nn_ngraph_sim.py:482-484):
    the per-test-trial loss vector keyed by trial indices, and the summary."""
    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--out_of_dist"]))
    assert rc == 0
    per_trial = tmp_path / "Out-of-dist-gamma-karate"
    summary = tmp_path / "Out-of-dist-gamma-trials-karate"
    assert per_trial.exists() and summary.exists()
    import csv

    with open(per_trial) as f:
        rows = list(csv.reader(f))
    header, losses = rows[0], rows[1]
    # header = test trial indices; one loss per test trial
    assert len(header) == len(losses) >= 1
    assert all(idx.isdigit() for idx in header)
    assert all(0.0 <= float(x) <= 1.0 for x in losses)
    with open(summary) as f:
        srows = list(csv.reader(f))
    assert srows[0][:3] == ["trial", "model", "lr"]
    # summary test_loss == mean of the per-trial losses (batch-of-1 semantics)
    test_loss = float(srows[1][srows[0].index("test_loss")])
    assert abs(test_loss - np.mean([float(x) for x in losses])) < 1e-5


def test_worker_beta_gamma_length_mismatch(tmp_path):
    argv = _base_argv(tmp_path)
    argv = argv[: argv.index("--gamma") + 3]  # truncate gamma to 2 of 5
    with pytest.raises(SystemExit):
        worker.main(argv)


def test_monitorer_config_json(tmp_path):
    import json

    cfg_path = tmp_path / "matrix.json"
    cfg_path.write_text(json.dumps({
        "epochs": 1, "trials_per_number": 2, "hidden_dim_array": [8],
        "datasets_array": [KARATE], "sim": 100, "max_time": 8,
        "batch_size": 2, "experiments_root": str(tmp_path), "seed": 5,
    }))
    rc = monitorer.main(["--config", str(cfg_path)])
    assert rc == 0
    assert (tmp_path / "Experiments-seed2-karate" / "initial-seed.pkl").exists()
    # unknown fields are rejected loudly
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"epoch": 1}))
    with pytest.raises(SystemExit):
        monitorer.main(["--config", str(bad)])


def test_monitorer_per_trial_mode(tmp_path, capsys):
    cfg = monitorer.MatrixConfig(
        many_graph_instances=False, epochs=1, trials_per_number=2,
        hidden_dim_array=(8,),
        datasets_array=(KARATE, "/root/reference/real_graphs/dolphins"),
        sim=100, max_time=8,
        experiments_root=str(tmp_path), seed=3,
    )
    rc = monitorer.run_matrix(cfg)
    assert rc == 0
    # one node-split worker per trial -> per-trial label files exist
    exp = tmp_path / "Experiments-seed2-karate"
    assert len(list(exp.glob("karate-S-*.pkl"))) == 2
    # `total` counts the WHOLE matrix across datasets (2 trials x 2 datasets)
    out = capsys.readouterr().out
    assert "Started experiment 1/4:" in out
    assert "Started experiment 4/4:" in out


def test_monitorer_matrix(tmp_path):
    cfg = monitorer.MatrixConfig(
        epochs=1, trials_per_number=3, hidden_dim_array=(8,),
        datasets_array=(KARATE,), sim=100, max_time=8, batch_size=2,
        experiments_root=str(tmp_path), seed=7,
    )
    rc = monitorer.run_matrix(cfg)
    assert rc == 0
    exp = tmp_path / "Experiments-seed2-karate"
    assert (exp / "initial-seed.pkl").exists()
    # rerun reloads persisted params (no resample) and --only filter works
    rc = monitorer.run_matrix(cfg, only=(1,))
    assert rc == 0


def test_monitorer_inprocess_survives_worker_systemexit(tmp_path, capsys,
                                                        monkeypatch):
    """An in-process worker signals validation errors / fault drills by
    raising SystemExit, which subclasses BaseException: the matrix loop
    must print the reference marker line and continue to the next job
    instead of dying (bare `except Exception` missed it). A clean
    SystemExit(0) counts as success."""
    calls = {"n": 0}

    def fake_main(argv):
        calls["n"] += 1
        if calls["n"] == 1:
            raise SystemExit("pinned trials < requested")  # failure signal
        if calls["n"] == 2:
            raise SystemExit(0)  # clean exit — NOT a failure
        return 0

    from gn_ode_sir_tpu.cli import worker as worker_mod

    monkeypatch.setattr(worker_mod, "main", fake_main)
    cfg = monitorer.MatrixConfig(
        epochs=1, trials_per_number=1, hidden_dim_array=(8, 16, 24),
        datasets_array=(KARATE,), sim=100, max_time=8,
        experiments_root=str(tmp_path), seed=6,
    )
    rc = monitorer.run_matrix(cfg)
    assert calls["n"] == 3, "matrix must continue past the SystemExit"
    assert rc == 1
    out = capsys.readouterr().out
    assert "Oops! Something broke!" in out
    assert "1 failures" in out


def test_monitorer_retry_transient_failure(tmp_path, capsys, monkeypatch):
    """--retry rides out a transient failure: the job is re-attempted after
    the backoff and a success on the second try counts as no failure. Retry
    forces subprocess isolation (a failed backend init is cached per
    process), so the attempts go through subprocess.call — faked here."""
    import subprocess as sp
    import time as time_mod

    calls = {"n": 0}

    def fake_call(argv_list, **kw):
        calls["n"] += 1
        return 1 if calls["n"] == 1 else 0  # transient: fails once

    monkeypatch.setattr(sp, "call", fake_call)
    monkeypatch.setattr(time_mod, "sleep", lambda s: None)
    cfg = monitorer.MatrixConfig(
        epochs=1, trials_per_number=2, hidden_dim_array=(8,),
        datasets_array=(KARATE,), sim=100, max_time=8,
        experiments_root=str(tmp_path), seed=5,
    )
    rc = monitorer.run_matrix(cfg, retries=2, retry_wait_s=0.0)
    assert rc == 0 and calls["n"] == 2
    out = capsys.readouterr().out
    assert "forces --subprocess" in out
    assert "attempt 1/3 failed" in out
    assert "0 failures" in out


def test_monitorer_retry_resume_only_own_checkpoint(tmp_path, monkeypatch):
    """Retry attempts append --resume ONLY when an attempt of this job wrote
    a checkpoint. A checkpoint that predates the job (a COMPLETED earlier
    run of the same trial in the same path_to_save) must not be resumed —
    fit() would restore epoch==epochs, train nothing, and report the old
    run's result as this repeat's CSV row."""
    import os
    import subprocess as sp
    import time as time_mod

    from gn_ode_sir_tpu.cli import worker as worker_mod

    cfg = monitorer.MatrixConfig(
        epochs=1, trials_per_number=2, hidden_dim_array=(8,),
        datasets_array=(KARATE,), sim=100, max_time=8,
        experiments_root=str(tmp_path), seed=5,
    )
    path_to_save = os.path.join(
        str(tmp_path), f"Experiments-seed{cfg.n_i[0]}-karate")
    ckpt_dir = worker_mod.checkpoint_dir_for(path_to_save, 1, "ode_nn", KARATE)

    monkeypatch.setattr(time_mod, "sleep", lambda s: None)

    # scenario A: stale pre-existing checkpoint; failing attempts write
    # nothing -> no --resume ever
    os.makedirs(ckpt_dir)
    with open(os.path.join(ckpt_dir, "state"), "w") as f:
        f.write("old run")
    old = time_mod.time() - 3600
    os.utime(os.path.join(ckpt_dir, "state"), (old, old))
    argvs = []

    def fail_call(argv_list, **kw):
        argvs.append(list(argv_list))
        return 1

    monkeypatch.setattr(sp, "call", fail_call)
    monitorer.run_matrix(cfg, retries=1, retry_wait_s=0.0)
    assert len(argvs) == 2
    assert all("--resume" not in a for a in argvs)

    # scenario B: the first attempt of this job writes a checkpoint before
    # dying -> the retry resumes it
    argvs.clear()

    def write_then_fail(argv_list, **kw):
        argvs.append(list(argv_list))
        if len(argvs) == 1:
            with open(os.path.join(ckpt_dir, "state"), "w") as f:
                f.write("this job")
            return 1
        return 0

    monkeypatch.setattr(sp, "call", write_then_fail)
    rc = monitorer.run_matrix(cfg, retries=1, retry_wait_s=0.0)
    assert rc == 0
    assert "--resume" not in argvs[0]
    assert "--resume" in argvs[1]


def test_worker_spmm_pallas2(tmp_path):
    """GNODE end-to-end on the chunked Pallas backend (interpret on CPU)."""
    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=("--spmm", "pallas2")))
    assert rc == 0


def test_worker_multigraph_rk_baseline(tmp_path):
    """--rk_baseline on a multigraph run fills the loss_baseline/rk_time
    CSV columns with the unseen graph's RK mean-field numbers (the columns
    the reference schema reserves, ode_nn_ngraphs.py:266-285)."""
    import pandas as pd

    argv = [
        "--dataset", "/root/reference/real_graphs/karate+dolphins",
        "--model", "ode_nn", "--hidden", "8", "--epochs", "2", "--lr", "1e-3",
        "--batch_size", "4", "--sim", "100", "--maxTime", "8",
        "--instances_per_graph", "3", "4",
        "--path_to_save", str(tmp_path), "--log_every", "10", "--seed", "3",
        "--rk_baseline",
    ]
    assert worker.main(argv) == 0
    df = pd.read_csv(tmp_path / "Metrics-trials-karate+dolphins")
    row = df.iloc[-1]
    assert row["loss_baseline"] > 0.0
    assert row["rk_time"] > 0.0
    assert np.isfinite(row["test_loss"])


def test_worker_crash_resume_drill(tmp_path):
    """Fault-injected crash mid-run + --resume completes the protocol from
    the periodic checkpoint: the drill for the environment's documented
    failure mode (mid-run TPU worker death)."""
    argv = _base_argv(tmp_path, "ode_nn") + [
        "--epochs", "6", "--checkpoint_every", "2",
    ]
    with pytest.raises(SystemExit) as exc:
        worker.main(argv + ["--die_at_epoch", "3"])
    assert exc.value.code == 17
    # crashed run never wrote its CSV row
    n_rows_before = 0
    csv = tmp_path / "Metrics-trials-karate"
    if csv.exists():
        n_rows_before = len(csv.read_text().splitlines())
    assert worker.main(argv + ["--resume"]) == 0
    assert csv.exists()
    assert len(csv.read_text().splitlines()) == n_rows_before + (2 if n_rows_before == 0 else 1)


def test_checkpoint_dir_naming():
    """Single-graph and '+'-multigraph runs get distinct, dataset-tagged
    checkpoint dirs (a names-free dir would collide across multigraph runs
    sharing a path_to_save)."""
    from gn_ode_sir_tpu.cli.worker import checkpoint_dir_for

    assert checkpoint_dir_for("/p", 3, "ode_nn", "./real_graphs/karate") == \
        "/p/ckpt-trial3-ode_nn"
    assert checkpoint_dir_for("/p", 1, "GCN", "./real_graphs/a+b+c") == \
        "/p/ckpt-trial1-GCN-mg-a-b-c"


def test_worker_ensemble_matches_sequential_repeats(tmp_path):
    """--ensemble K writes the SAME K CSV rows as K sequential workers with
    init seeds --init_seed+j / trials --trial+j (the repeat protocol fused
    into one vmapped program, train/ensemble.py)."""
    import pandas as pd

    seq_dir, ens_dir = tmp_path / "seq", tmp_path / "ens"
    for trial, init_seed in ((1, 5), (2, 6)):
        rc = worker.main(_base_argv(
            seq_dir, "ode_nn",
            extra=["--trial", str(trial), "--init_seed", str(init_seed)]))
        assert rc == 0
    rc = worker.main(_base_argv(
        ens_dir, "ode_nn",
        extra=["--trial", "1", "--init_seed", "5", "--ensemble", "2"]))
    assert rc == 0

    seq = pd.read_csv(seq_dir / "Metrics-trials-karate")
    ens = pd.read_csv(ens_dir / "Metrics-trials-karate")
    assert len(seq) == len(ens) == 2
    assert list(ens["trial"]) == [1, 2]
    for col in ("best_epoch", "hidden", "trial"):
        assert list(ens[col]) == list(seq[col])
    for col in ("val_loss", "test_loss"):
        np.testing.assert_allclose(ens[col], seq[col], rtol=2e-5, atol=1e-7)


def test_worker_ensemble_rejects_unsupported_modes(tmp_path):
    with pytest.raises(SystemExit, match="ensemble"):
        worker.main(_base_argv(tmp_path, "dmp", extra=["--ensemble", "2"]))
    with pytest.raises(SystemExit, match="ensemble"):
        worker.main(_base_argv(tmp_path, "ode_nn",
                               extra=["--ensemble", "2", "--node_split"]))


def test_worker_multigraph_rejects_out_of_dist(tmp_path):
    """--out_of_dist on a '+'-joined dataset must refuse loudly — the OOD
    gamma-binned split is a single-graph protocol, and silently training
    the ordinary multigraph protocol would misreport what ran."""
    argv = ["--dataset", "/root/reference/real_graphs/karate+dolphins",
            "--out_of_dist",
            "--epochs", "1", "--hidden", "4", "--sim", "50",
            "--maxTime", "8", "--path_to_save", str(tmp_path)]
    with pytest.raises(SystemExit, match="single-graph protocol"):
        worker.main(argv)


def test_worker_ensemble_out_of_dist(tmp_path):
    """--ensemble K + --out_of_dist writes the same two OOD CSVs as K
    sequential OOD workers (ode_nn_ngraph_sim.py:482-484): K per-trial loss
    rows keyed by test trial indices, and K summary rows."""
    import pandas as pd

    seq_dir, ens_dir = tmp_path / "seq", tmp_path / "ens"
    for trial, init_seed in ((1, 5), (2, 6)):
        rc = worker.main(_base_argv(
            seq_dir, "ode_nn",
            extra=["--out_of_dist", "--trial", str(trial),
                   "--init_seed", str(init_seed)]))
        assert rc == 0
    rc = worker.main(_base_argv(
        ens_dir, "ode_nn",
        extra=["--out_of_dist", "--trial", "1", "--init_seed", "5",
               "--ensemble", "2"]))
    assert rc == 0

    seq = pd.read_csv(seq_dir / "Out-of-dist-gamma-karate")
    ens = pd.read_csv(ens_dir / "Out-of-dist-gamma-karate")
    assert list(seq.columns) == list(ens.columns)  # test trial indices
    assert len(seq) == len(ens) == 2
    np.testing.assert_allclose(ens.values, seq.values, rtol=2e-5, atol=1e-7)

    seq_s = pd.read_csv(seq_dir / "Out-of-dist-gamma-trials-karate")
    ens_s = pd.read_csv(ens_dir / "Out-of-dist-gamma-trials-karate")
    assert len(seq_s) == len(ens_s) == 2
    for col in ("trial", "best_epoch", "hidden"):
        assert list(ens_s[col]) == list(seq_s[col])
    for col in ("val_loss", "test_loss"):
        np.testing.assert_allclose(ens_s[col], seq_s[col], rtol=2e-5, atol=1e-7)


def test_monitorer_ensemble_groups_repeats(tmp_path, capsys):
    """--ensemble folds the hidden_dim_array repeat runs into one procedure
    that writes one CSV row per repeat."""
    import pandas as pd

    cfg = monitorer.MatrixConfig(
        epochs=1, trials_per_number=3, hidden_dim_array=(8, 8),
        datasets_array=(KARATE,), sim=100, max_time=8, batch_size=2,
        experiments_root=str(tmp_path), seed=7,
    )
    rc = monitorer.run_matrix(cfg, ensemble=True)
    out = capsys.readouterr().out
    assert rc == 0
    assert "Started experiment 1/1:" in out
    assert "ensemble=2" in out
    df = pd.read_csv(tmp_path / "Experiments-seed2-karate" /
                     "Metrics-trials-karate")
    assert list(df["trial"]) == [1, 2]


def test_worker_ensemble_multigraph(tmp_path):
    """--ensemble on a '+'-dataset: K members train on the padded multigraph
    connectivity and write K rows with the unseen-graph protocol."""
    import pandas as pd

    argv = [
        "--dataset", "/root/reference/real_graphs/karate+dolphins",
        "--model", "ode_nn", "--hidden", "8", "--epochs", "2", "--lr", "1e-3",
        "--batch_size", "4", "--sim", "100", "--maxTime", "8",
        "--instances_per_graph", "4", "6",
        "--path_to_save", str(tmp_path), "--log_every", "10", "--seed", "1",
        "--ensemble", "2",
    ]
    rc = worker.main(argv)
    assert rc == 0
    df = pd.read_csv(tmp_path / "Metrics-trials-karate+dolphins")
    assert list(df["trial"]) == [1, 2]
    assert np.isfinite(df["test_loss"]).all()


def test_monitorer_ensemble_rejects_incompatible_configs(tmp_path):
    cfg = monitorer.MatrixConfig(model="dmp", datasets_array=(KARATE,),
                                 experiments_root=str(tmp_path))
    with pytest.raises(SystemExit, match="ensemble"):
        monitorer.run_matrix(cfg, ensemble=True)
    cfg = monitorer.MatrixConfig(many_graph_instances=False,
                                 datasets_array=(KARATE,),
                                 experiments_root=str(tmp_path))
    with pytest.raises(SystemExit, match="ensemble"):
        monitorer.run_matrix(cfg, ensemble=True)


def test_worker_ensemble_save_checkpoint_uses_ens_dir(tmp_path):
    """--ensemble --save_checkpoint must not write a K-stacked pytree into
    the sequential trial's checkpoint directory."""
    rc = worker.main(_base_argv(
        tmp_path, "ode_nn",
        extra=["--ensemble", "2", "--save_checkpoint"]))
    assert rc == 0
    assert (tmp_path / "ckpt-trial1-ode_nn-ens2").is_dir()
    assert not (tmp_path / "ckpt-trial1-ode_nn").exists()


def test_infer_cli_serves_checkpoint(tmp_path):
    """Serving entry point: worker --save_checkpoint -> cli.infer scores new
    scenarios through the restored params; trajectories match a direct
    model.predict with the same params (the checkpoint round-trips) and the
    probabilities are a valid simplex per node/time."""

    from gn_ode_sir_tpu.cli import infer

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    out = tmp_path / "pred.npz"
    summary = tmp_path / "summary.csv"
    rc = infer.main([
        "--ckpt", str(ckpt), "--dataset", KARATE, "--model", "ode_nn",
        "--hidden", "8", "--maxTime", "8",
        "--I_indices", "[2, 5]", "[7]",
        "--beta", "0.3", "0.2", "--gamma", "0.1", "0.4",
        "--out", str(out), "--summary_csv", str(summary),
    ])
    assert rc == 0
    d = np.load(out, allow_pickle=True)
    assert d["S"].shape == (2, 8, 34)
    total = d["S"] + d["I"] + d["R"]
    np.testing.assert_allclose(total, 1.0, atol=1e-5)
    assert summary.exists()

    # round-trip check: same params + same inputs through the library API
    import jax

    from gn_ode_sir_tpu.graphs import load_graph

    g = load_graph(KARATE)
    args = infer.build_parser().parse_args([
        "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
        "--maxTime", "8", "--I_indices", "x"])
    model, adj = worker.build_model_and_adj(args, g, batch_size=2)
    params = infer.restore_params(str(ckpt))
    s0, i0, r0, beta, gamma = infer.scenario_batch(
        g.n_nodes, [[2, 5], [7]], [0.3, 0.2], [0.1, 0.4])
    direct = model.predict(params, adj, s0, i0, r0,
                           jax.numpy.asarray(beta), jax.numpy.asarray(gamma))
    np.testing.assert_allclose(
        np.transpose(np.asarray(direct), (1, 0, 2, 3))[..., 1], d["I"],
        atol=1e-5)


def test_infer_cli_spmd_matches_single_device(tmp_path):
    """--spmd shards an uneven scenario batch over the host's virtual
    devices (pad + slice) and reproduces the single-device trajectories."""
    from gn_ode_sir_tpu.cli import infer

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    common = [
        "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
        "--maxTime", "8",
        "--I_indices", "[2, 5]", "[7]", "[1, 4]",
        "--beta", "0.3", "0.2", "0.25", "--gamma", "0.1", "0.4", "0.3",
    ]
    out1, out2 = tmp_path / "p1.npz", tmp_path / "p2.npz"
    assert infer.main([*common, "--out", str(out1)]) == 0
    assert infer.main([*common, "--out", str(out2), "--spmd"]) == 0
    a, b = np.load(out1), np.load(out2)
    assert b["I"].shape == (3, 8, 34)  # padding sliced back off
    np.testing.assert_allclose(a["I"], b["I"], atol=1e-5)


def test_infer_cli_serves_multigraph_checkpoint_on_new_graph(tmp_path):
    """The transfer deployment story: a model trained on the '+'-dataset
    protocol (train graphs + unseen eval graph) saves a checkpoint whose
    params are graph-agnostic, so cli.infer scores scenarios on a THIRD
    graph never seen in training."""
    from gn_ode_sir_tpu.cli import infer

    argv = [
        "--dataset", "/root/reference/real_graphs/karate+dolphins",
        "--model", "ode_nn", "--hidden", "8", "--epochs", "2", "--lr", "1e-3",
        "--batch_size", "4", "--sim", "100", "--maxTime", "8",
        "--instances_per_graph", "4", "6",
        "--path_to_save", str(tmp_path), "--log_every", "10", "--seed", "1",
        "--save_checkpoint",
    ]
    assert worker.main(argv) == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn-mg-karate-dolphins"
    assert ckpt.is_dir()
    out = tmp_path / "fbfood_pred.npz"
    rc = infer.main([
        "--ckpt", str(ckpt),
        "--dataset", "/root/reference/real_graphs/fb-food",
        "--model", "ode_nn", "--hidden", "8", "--maxTime", "8",
        "--I_indices", "[10, 40]", "--beta", "0.3", "--gamma", "0.15",
        "--out", str(out),
    ])
    assert rc == 0
    d = np.load(out)
    assert d["I"].shape == (1, 8, 620)  # fb-food width — a new graph
    np.testing.assert_allclose(d["S"] + d["I"] + d["R"], 1.0, atol=1e-5)


def test_infer_cli_summary_only_matches_full(tmp_path):
    """--summary_only reduces on device; rows must equal the host-side
    summaries of the full trajectory (and no .npz is written)."""

    from gn_ode_sir_tpu.cli import infer

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    common = [
        "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
        "--maxTime", "8", "--I_indices", "[2, 5]", "[7]",
        "--beta", "0.3", "0.2", "--gamma", "0.1", "0.4",
    ]
    out = tmp_path / "full.npz"
    assert infer.main([*common, "--out", str(out)]) == 0
    full = np.load(out)
    host_rows = infer.summarize(np.stack(
        [full["S"], full["I"], full["R"]], axis=-1))

    skip = tmp_path / "absent.npz"
    assert infer.main([*common, "--out", str(skip), "--summary_only"]) == 0
    assert not skip.exists()
    args = infer.build_parser().parse_args([*common, "--out", str(skip)])
    from gn_ode_sir_tpu.graphs import load_graph
    g = load_graph(KARATE)
    model, adj = worker.build_model_and_adj(args, g, batch_size=2)
    params = infer.restore_params(str(ckpt))
    s0, i0, r0, b, gm = infer.scenario_batch(
        g.n_nodes, [[2, 5], [7]], [0.3, 0.2], [0.1, 0.4])
    dev_rows = infer.predict_summaries(model, params, adj, s0, i0, r0, b, gm)
    for h, d in zip(host_rows, dev_rows):
        assert h["peak_time"] == d["peak_time"]
        np.testing.assert_allclose(
            h["peak_infected_frac"], d["peak_infected_frac"], atol=1e-5)
        np.testing.assert_allclose(
            h["final_recovered_frac"], d["final_recovered_frac"], atol=1e-5)


def test_infer_cli_spmd_summary_only_matches_single_device(tmp_path):
    """--spmd composed with --summary_only (round 5): the per-scenario
    reduction runs inside each batch shard; rows must equal the
    single-device summary path on an UNEVEN batch (pad + slice)."""
    from gn_ode_sir_tpu.cli import infer

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    common = [
        "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
        "--maxTime", "8",
        "--I_indices", "[2, 5]", "[7]", "[1, 4]",
        "--beta", "0.3", "0.2", "0.25", "--gamma", "0.1", "0.4", "0.3",
    ]
    csv1 = tmp_path / "single.csv"
    csv2 = tmp_path / "spmd.csv"
    assert infer.main([*common, "--summary_only",
                       "--summary_csv", str(csv1)]) == 0
    assert infer.main([*common, "--summary_only", "--spmd",
                       "--summary_csv", str(csv2)]) == 0
    import csv as csvmod

    with open(csv1) as f:
        a = list(csvmod.DictReader(f))
    with open(csv2) as f:
        b = list(csvmod.DictReader(f))
    assert len(a) == len(b) == 3  # padding rows sliced back off
    for ra, rb in zip(a, b):
        assert ra["peak_time"] == rb["peak_time"]
        np.testing.assert_allclose(float(ra["peak_infected_frac"]),
                                   float(rb["peak_infected_frac"]), atol=1e-5)
        np.testing.assert_allclose(float(ra["final_recovered_frac"]),
                                   float(rb["final_recovered_frac"]), atol=1e-5)


def test_infer_summary_dispatch_batch_chunking_exact(tmp_path):
    """--dispatch_batch chunks the scenario sweep into fixed-size dispatches
    (uneven tail padded + sliced); rows must equal the single-dispatch
    path — summaries are per-scenario, so chunking is exact."""
    import jax

    from gn_ode_sir_tpu.cli import infer
    from gn_ode_sir_tpu.graphs import load_graph

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    g = load_graph(KARATE)
    args = infer.build_parser().parse_args([
        "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
        "--maxTime", "8", "--I_indices", "x"])
    model, adj = worker.build_model_and_adj(args, g, batch_size=10)
    params = infer.restore_params(str(ckpt))
    rng = np.random.default_rng(0)
    seeds = [sorted(rng.choice(g.n_nodes, 2, replace=False).tolist())
             for _ in range(10)]
    sb = infer.scenario_batch(g.n_nodes, seeds,
                              rng.uniform(0.1, 0.5, 10),
                              rng.uniform(0.1, 0.5, 10))
    whole = infer.predict_summaries(model, params, adj, *sb)
    chunked = infer.predict_summaries(model, params, adj, *sb,
                                      dispatch_batch=4)  # 4+4+2 (padded tail)
    assert len(whole) == len(chunked) == 10
    for a, b in zip(whole, chunked):
        assert a["peak_time"] == b["peak_time"]
        np.testing.assert_allclose(a["peak_infected_frac"],
                                   b["peak_infected_frac"], atol=1e-6)
        np.testing.assert_allclose(a["final_recovered_frac"],
                                   b["final_recovered_frac"], atol=1e-6)

    # the full-trajectory path honors the same cap (chunks concatenate on
    # the batch axis)
    full = infer.predict_scenarios(model, params, adj, *sb)
    full_chunked = infer.predict_scenarios(model, params, adj, *sb,
                                           dispatch_batch=4)
    np.testing.assert_allclose(full, full_chunked, atol=1e-6)

    # spmd + dispatch_batch composes: the params host pull is hoisted out
    # of the per-chunk path (each chunk's _spmd_dispatch sees numpy leaves
    # and must NOT re-convert), and rows still match the single-device sweep
    both = infer.predict_summaries(model, params, adj, *sb,
                                   spmd=True, dispatch_batch=4)
    for a, b in zip(whole, both):
        # peak_time is an argmax over differently-compiled programs: allow
        # a 1-step flip on a float-rounding tie rather than bitwise equality
        assert abs(a["peak_time"] - b["peak_time"]) <= 1
        np.testing.assert_allclose(a["peak_infected_frac"],
                                   b["peak_infected_frac"], atol=1e-5)
    full_spmd_chunked = infer.predict_scenarios(model, params, adj, *sb,
                                                spmd=True, dispatch_batch=4)
    np.testing.assert_allclose(full, full_spmd_chunked, atol=1e-5)

    # a non-positive cap exits loudly through the CLI
    import pytest

    with pytest.raises(SystemExit, match="dispatch_batch"):
        infer.main([
            "--ckpt", str(ckpt), "--dataset", KARATE, "--hidden", "8",
            "--maxTime", "8", "--I_indices", "[2, 5]",
            "--summary_only", "--dispatch_batch", "-1"])


def test_infer_scenarios_json_and_validation(tmp_path):
    """--scenarios JSON file loads; misaligned inline arrays exit loudly."""
    import json

    from gn_ode_sir_tpu.cli import infer

    sc = tmp_path / "sc.json"
    sc.write_text(json.dumps([
        {"seeds": [2, 5], "beta": 0.3, "gamma": 0.1},
        {"seeds": [7], "beta": 0.2, "gamma": 0.4},
    ]))
    args = infer.build_parser().parse_args([
        "--ckpt", "x", "--dataset", "y", "--scenarios", str(sc)])
    seeds, beta, gamma = infer.load_scenarios(args)
    assert seeds == [[2, 5], [7]]
    np.testing.assert_allclose(beta, [0.3, 0.2])
    np.testing.assert_allclose(gamma, [0.1, 0.4])

    bad = infer.build_parser().parse_args([
        "--ckpt", "x", "--dataset", "y",
        "--I_indices", "[2, 5]", "[7]", "--beta", "0.3"])
    with pytest.raises(SystemExit, match="align"):
        infer.load_scenarios(bad)


def test_infer_cli_rejects_architecture_mismatch(tmp_path):
    """A wrong --hidden must fail loudly, not serve a silently different
    model (restored params are validated against the declared pytree)."""
    from gn_ode_sir_tpu.cli import infer

    rc = worker.main(_base_argv(tmp_path, "ode_nn", extra=["--save_checkpoint"]))
    assert rc == 0
    with pytest.raises(SystemExit, match="architecture"):
        infer.main([
            "--ckpt", str(tmp_path / "ckpt-trial1-ode_nn"),
            "--dataset", KARATE, "--hidden", "16", "--maxTime", "8",
            "--I_indices", "[2, 5]", "--beta", "0.3", "--gamma", "0.1",
            "--out", str(tmp_path / "x.npz")])


def test_save_checkpoint_preserves_resume_state(tmp_path):
    """--save_checkpoint writes <dir>/serve and must NOT clobber the
    <dir>/state tree fit()'s periodic/resume protocol owns."""
    rc = worker.main(_base_argv(
        tmp_path, "ode_nn",
        extra=["--save_checkpoint", "--checkpoint_every", "1"]))
    assert rc == 0
    ckpt = tmp_path / "ckpt-trial1-ode_nn"
    assert (ckpt / "serve").is_dir()
    assert (ckpt / "state").is_dir()
    # the resume layout is intact: a --resume rerun restores and completes
    rc = worker.main(_base_argv(
        tmp_path, "ode_nn", extra=["--save_checkpoint", "--resume"]))
    assert rc == 0


def test_summary_reduce_masked_fractions_exact():
    """_summary_reduce with a node mask must compute fractions over REAL
    nodes only: a graph padded n_g -> n_max would otherwise read peak/final
    fractions scaled by n_g/n_max (round-5 review finding)."""
    from gn_ode_sir_tpu.cli.infer import _summary_reduce

    rng = np.random.default_rng(0)
    T, B, n = 5, 3, 8
    probs = rng.random((T, B, n, 3)).astype(np.float32)
    mask = np.ones((B, n), np.float32)
    mask[1, 4:] = 0.0  # scenario 1 lives on a 4-node graph padded to 8
    probs[:, 1, 4:, :] = 0.0  # padding rows are zeroed upstream

    out = np.asarray(_summary_reduce(probs, mask))
    # full-width scenarios match the unmasked reduction
    un = np.asarray(_summary_reduce(probs))
    np.testing.assert_allclose(out[0], un[0], atol=1e-6)
    np.testing.assert_allclose(out[2], un[2], atol=1e-6)
    # the padded scenario averages over its 4 real nodes, not all 8
    i_t = probs[:, 1, :4, 1].mean(axis=1)
    np.testing.assert_allclose(out[1, 0], i_t.max(), atol=1e-6)
    np.testing.assert_allclose(out[1, 1], float(i_t.argmax()), atol=1e-6)
    np.testing.assert_allclose(out[1, 2], probs[-1, 1, :4, 2].mean(),
                               atol=1e-6)
    assert un[1, 0] < out[1, 0]  # the bias the mask removes
