"""CLI surface test: same five commands and flags as the reference
(reference cnmf.py:1239-1294)."""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cli


@pytest.fixture(scope="module")
def counts_fn(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(4)
    W = rng.gamma(0.7, 1.0, size=(120, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 150)) * (rng.rand(4, 150) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(150)])
    fn = str(tmp / "counts.txt")
    df.to_csv(fn, sep="\t")
    return fn


def test_cli_full_pipeline(counts_fn, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cliout"))
    base = ["--output-dir", out, "--name", "clirun"]
    cli.main(["prepare", *base, "-c", counts_fn, "-k", "4", "5",
              "-n", "5", "--seed", "14", "--numgenes", "100"])
    cli.main(["factorize", *base])
    cli.main(["combine", *base])
    cli.main(["k_selection_plot", *base])
    cli.main(["consensus", *base, "-k", "4", "--show-clustering"])

    top = os.path.join(out, "clirun")
    for fn in [
        "clirun.overdispersed_genes.txt",
        "clirun.k_selection.png",
        "clirun.k_selection_stats.df.npz",
        "clirun.spectra.k_4.dt_0_5.consensus.txt",
        "clirun.usages.k_4.dt_0_5.consensus.txt",
        "clirun.gene_spectra_score.k_4.dt_0_5.txt",
        "clirun.gene_spectra_tpm.k_4.dt_0_5.txt",
        "clirun.starcat_spectra.k_4.dt_0_5.txt",
        "clirun.clustering.k_4.dt_0_5.png",
    ]:
        assert os.path.exists(os.path.join(top, fn)), fn


def test_cli_worker_sharding(counts_fn, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cliworkers"))
    base = ["--output-dir", out, "--name", "w"]
    cli.main(["prepare", *base, "-c", counts_fn, "-k", "4", "-n", "4",
              "--seed", "3", "--numgenes", "80"])
    cli.main(["factorize", *base, "--worker-index", "0", "--total-workers", "2"])
    cli.main(["factorize", *base, "--worker-index", "1", "--total-workers", "2"])
    cli.main(["combine", *base])
    from cnmf_tpu.io.dataframe import load_df_from_npz
    merged = load_df_from_npz(
        os.path.join(out, "w", "cnmf_tmp", "w.spectra.k_4.merged.df.npz")
    )
    assert merged.shape == (4 * 4, 80)
    assert list(merged.index[:4]) == [f"iter0_topic{t}" for t in range(1, 5)]


def test_cli_rejects_unknown_command(capsys):
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])
