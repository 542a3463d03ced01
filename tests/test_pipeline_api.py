"""API-surface tests: resume/elasticity semantics, load_results, refits,
timing registry (reference behaviors from cnmf.py:636-651, 729-733, 1161-1210)."""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz
from cnmf_tpu.utils.timing import timings


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("api")
    rng = np.random.RandomState(9)
    W = rng.gamma(0.7, 1.0, size=(150, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 200)) * (rng.rand(5, 200) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(150)],
                      columns=[f"g{j}" for j in range(200)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="api")
    obj.prepare(counts_fn=fn, components=[5], n_iter=6, seed=2, num_highvar_genes=120)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=5, density_threshold=0.5, show_clustering=False)
    return obj


def test_update_nmf_iter_params_rescans_disk(run):
    victim = run.paths["iter_spectra"] % (5, 2)
    os.rename(victim, victim + ".bak")
    try:
        run.update_nmf_iter_params()
        params = load_df_from_npz(run.paths["nmf_replicate_parameters"])
        assert not params.loc[params["iter"] == 2, "completed"].iloc[0]
        assert params.loc[params["iter"] == 3, "completed"].iloc[0]
    finally:
        os.rename(victim + ".bak", victim)


def test_skip_completed_runs_only_redoes_missing(run):
    victim = run.paths["iter_spectra"] % (5, 4)
    os.remove(victim)
    run.update_nmf_iter_params()
    others_mtime = {
        i: os.path.getmtime(run.paths["iter_spectra"] % (5, i))
        for i in [0, 1, 2, 3, 5]
    }
    run.factorize(skip_completed_runs=True, verbose=False)
    assert os.path.exists(victim)
    for i, mtime in others_mtime.items():
        assert os.path.getmtime(run.paths["iter_spectra"] % (5, i)) == mtime


def test_load_results(run):
    usage, scores, tpm, top_genes = run.load_results(K=5, density_threshold=0.5,
                                                     n_top_genes=10)
    assert usage.shape == (150, 5)
    np.testing.assert_allclose(usage.sum(axis=1), 1.0, rtol=1e-9)
    assert scores.shape[1] == 5 and tpm.shape[1] == 5
    assert scores.shape[0] == 200  # genes × GEPs after transpose
    assert top_genes.shape == (10, 5)
    # top genes are the argmax-z-score genes of each GEP
    for gep in scores.columns:
        assert top_genes[gep].iloc[0] == scores[gep].idxmax()


def test_refit_usage_dataframe_roundtrip(run):
    spectra = load_df_from_npz(run.paths["consensus_spectra"] % (5, "0_5"))
    from cnmf_tpu.io.h5ad import read_h5ad

    norm = read_h5ad(run.paths["normalized_counts"])
    Xdf = pd.DataFrame(
        np.asarray(norm.X.todense()) if hasattr(norm.X, "todense") else norm.X,
        index=norm.obs.index, columns=norm.var.index,
    )
    ru = run.refit_usage(Xdf, spectra)
    assert isinstance(ru, pd.DataFrame)
    assert list(ru.index) == list(Xdf.index)
    assert list(ru.columns) == list(spectra.index)
    rs = run.refit_spectra(Xdf, ru)
    assert rs.shape == spectra.shape


def test_nmf_compat_method(run):
    """_nmf mirrors the reference's (spectra, usages) convention."""
    import yaml

    kwargs = yaml.load(open(run.paths["nmf_run_parameters"]), Loader=yaml.FullLoader)
    kwargs = dict(kwargs, n_components=4, random_state=11)
    rng = np.random.RandomState(0)
    X = rng.gamma(1.0, 1.0, (40, 30))
    spectra, usages = run._nmf(X, kwargs)
    assert spectra.shape == (4, 30) and usages.shape == (40, 4)
    err = np.linalg.norm(X - usages @ spectra) / np.linalg.norm(X)
    assert err < 0.9


def test_stage_timings_recorded(run):
    t = timings()
    for stage in ["prepare", "factorize", "combine", "consensus"]:
        assert stage in t and len(t[stage]) >= 1


def test_auto_name_format(tmp_path):
    obj = cNMF(output_dir=str(tmp_path))
    import re

    assert re.match(r"\d{4}_\d{2}_\d{2}_[0-9a-f]{6}$", obj.name)


def test_yaml_kwargs_contract(run):
    """The persisted solver kwargs must carry the reference's exact keys and
    defaults, including the cd-for-frobenius flip (reference cnmf.py:618-631)."""
    import yaml

    kwargs = yaml.load(open(run.paths["nmf_run_parameters"]), Loader=yaml.FullLoader)
    assert kwargs == {
        "alpha_W": 0.0, "alpha_H": 0.0, "l1_ratio": 0.0,
        "beta_loss": "frobenius", "solver": "cd", "tol": 1e-4,
        "max_iter": 1000, "init": "random",
    }


def test_kl_yaml_uses_mu(tmp_path):
    import yaml
    from cnmf_tpu import cNMF

    rng = np.random.RandomState(0)
    X = rng.poisson(3.0, size=(60, 80)).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(60)],
                      columns=[f"g{j}" for j in range(80)])
    fn = str(tmp_path / "c.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="kl")
    obj.prepare(counts_fn=fn, components=[3], n_iter=2, seed=1,
                num_highvar_genes=40, beta_loss="kullback-leibler")
    kwargs = yaml.load(open(obj.paths["nmf_run_parameters"]), Loader=yaml.FullLoader)
    assert kwargs["solver"] == "mu" and kwargs["beta_loss"] == "kullback-leibler"


def test_prepare_rerun_warns_about_completed(run, tmp_path):
    """Re-running prepare with completed iteration files warns instead of
    clobbering (reference cnmf.py:612-616)."""
    import warnings as w

    counts_fn = os.path.normpath(os.path.join(
        os.path.dirname(run.paths["nmf_genes_list"]), "..", "counts.txt"))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        run.prepare(counts_fn=counts_fn, components=[5], n_iter=6, seed=2,
                    num_highvar_genes=120)
    assert any("already appear completed" in str(c.message) for c in caught)


def test_combine_components_subset(run):
    """combine(components=k) only touches that K (reference cnmf.py:474-483)."""
    merged = run.paths["merged_spectra"] % 5
    before = os.path.getmtime(merged)
    run.combine(components=5)
    assert os.path.getmtime(merged) >= before


def test_consensus_preloaded_norm_counts_equivalent(run):
    from cnmf_tpu.io.h5ad import read_h5ad

    stats_a = run.consensus(k=5, skip_density_and_return_after_stats=True,
                            show_clustering=False)
    preloaded = read_h5ad(run.paths["normalized_counts"])
    stats_b = run.consensus(k=5, skip_density_and_return_after_stats=True,
                            show_clustering=False, norm_counts=preloaded)
    np.testing.assert_allclose(
        stats_a.loc["prediction_error"].values.astype(float),
        stats_b.loc["prediction_error"].values.astype(float), rtol=1e-6,
    )


def test_clustergram_png_nontrivial(run):
    run.consensus(k=5, density_threshold=1.8, show_clustering=True,
                  close_clustergram_fig=True)
    png = run.paths["clustering_plot"] % (5, "1_8")
    assert os.path.exists(png) and os.path.getsize(png) > 10_000


def test_k_selection_stats_schema(run):
    """k_selection_plot writes the reference-shaped stats table (one row per
    K with k / local_density_threshold / silhouette / prediction_error,
    reference cnmf.py:1124-1135) and the PNG."""
    stats = run.k_selection_plot(close_fig=True)
    assert list(stats.columns) == [
        "k", "local_density_threshold", "silhouette", "prediction_error"
    ]
    assert list(stats.k.astype(int)) == [5]
    assert np.isfinite(stats.silhouette).all()
    assert (stats.prediction_error > 0).all()
    assert os.path.exists(run.paths["k_selection_plot"])
    saved = load_df_from_npz(run.paths["k_selection_stats"])
    np.testing.assert_allclose(
        saved.values.astype(float), stats.values.astype(float)
    )


def test_consensus_stats_agree_with_k_selection(run):
    """The consensus(skip_density...) early-return and k_selection_plot rows
    go through the same fused program and must agree exactly."""
    stats_row = run.consensus(k=5, skip_density_and_return_after_stats=True,
                              show_clustering=False)
    table = run.k_selection_plot(close_fig=True)
    assert abs(float(stats_row.loc["silhouette"].iloc[0])
               - float(table.silhouette.iloc[0])) < 1e-12
    assert abs(float(stats_row.loc["prediction_error"].iloc[0])
               - float(table.prediction_error.iloc[0])) < 1e-9 * float(
                   table.prediction_error.iloc[0])


def test_artifact_memo_matches_disk_and_invalidates(tmp_path):
    """Same-process stages may reuse just-written artifacts from memory; the
    memo must mirror the disk bytes exactly and yield to out-of-band writes
    (mtime validation), so multi-worker/file semantics are unchanged."""
    from cnmf_tpu.io.dataframe import save_df_to_npz

    rng = np.random.RandomState(5)
    X = rng.poisson(rng.gamma(0.7, 1.0, size=(80, 4)) @
                    (rng.gamma(0.5, 1.0, size=(4, 120)) *
                     (rng.rand(4, 120) < 0.4)) * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(80)],
                      columns=[f"g{j}" for j in range(120)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="memo")
    obj.prepare(counts_fn=fn, components=[4], n_iter=4, seed=3,
                num_highvar_genes=80)
    obj.factorize(verbose=False)
    obj.combine()

    p = obj.paths["merged_spectra"] % 4
    hit = obj._recall_artifact(p)
    assert hit is not None
    disk = load_df_from_npz(p)
    assert list(hit.index) == list(disk.index)
    np.testing.assert_array_equal(hit.values, disk.values)

    # out-of-band rewrite (e.g. another worker) must invalidate the memo
    save_df_to_npz(disk * 2.0, p)
    os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
    assert obj._recall_artifact(p) is None

    # a fresh object has no memo at all
    obj2 = cNMF(output_dir=str(tmp_path), name="memo")
    assert obj2._recall_artifact(p) is None


def test_combine_return_value_mutation_is_harmless(run):
    """combine_nmf hands the caller a frame it may freely mutate; the memo
    that consensus/k_selection later recall must keep the on-disk values
    (review finding: the memo used to alias the returned object)."""
    returned = run.combine_nmf(5)
    disk = load_df_from_npz(run.paths["merged_spectra"] % 5)
    returned.iloc[:, :] = -1.0  # caller trashes their copy
    hit = run._recall_artifact(run.paths["merged_spectra"] % 5)
    assert hit is not None
    np.testing.assert_array_equal(hit.values, disk.values)


def test_combine_mixed_dtype_iter_files(run):
    """Partial re-runs can mix eras: an old f64 per-iter file next to new
    native-dtype files must invalidate the stack memo (stat change) and the
    file-read fallback must still merge to the same values."""
    from cnmf_tpu.io.dataframe import save_df_to_npz

    before = load_df_from_npz(run.paths["merged_spectra"] % 5)
    path2 = run.paths["iter_spectra"] % (5, 2)
    old_era = load_df_from_npz(path2).astype(np.float64)
    save_df_to_npz(old_era, path2)
    merged = run.combine_nmf(5)
    np.testing.assert_allclose(merged.values, before.values, rtol=0, atol=0)
    disk = load_df_from_npz(run.paths["merged_spectra"] % 5)
    np.testing.assert_allclose(disk.values, before.values, rtol=0, atol=0)


def test_factorize_multi_process_notice(run, capsys):
    """The pool shim must say out loud that total_workers is absorbed by the
    batched device program (behavior change vs reference cnmf.py:677-689)."""
    run.factorize_multi_process(total_workers=4)
    out = capsys.readouterr().out
    assert "total_workers=4 ignored" in out
    run.factorize_multi_process()
    out = capsys.readouterr().out
    assert "ignored" not in out


def test_artifact_memo_concurrent_accounting(tmp_path):
    """Hammer the memo from a thread pool (factorize writes from one) and
    re-memoize/invalidate repeatedly: the byte accounting must stay exactly
    consistent with the dict contents — a drifting counter would silently
    disable the memo (review finding)."""
    from concurrent.futures import ThreadPoolExecutor

    obj = cNMF(output_dir=str(tmp_path), name="memoacct")
    paths = []
    for i in range(16):
        p = str(tmp_path / f"a{i}.npz")
        with open(p, "wb") as fh:
            fh.write(b"x" * (i + 1))
        paths.append(p)

    def worker(i):
        arr = np.zeros(1000 + i)
        for _ in range(50):
            obj._memo_artifact(paths[i % len(paths)], arr, arr.nbytes)
            obj._recall_artifact(paths[(i + 1) % len(paths)])
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        assert all(pool.map(worker, range(32)))

    memo = obj._artifact_memo
    expected = sum(entry[3] for entry in memo.values())
    assert obj._artifact_memo_bytes == expected

    # invalidations must release their charge
    for p in paths[:8]:
        os.utime(p, (1, 1))
        assert obj._recall_artifact(p) is None
    expected = sum(entry[3] for entry in obj._artifact_memo.values())
    assert obj._artifact_memo_bytes == expected

    # budget rejection leaves accounting untouched
    big = np.zeros(1)
    obj._memo_artifact(paths[8], big, int(1e18))
    assert obj._artifact_memo_bytes == expected
