"""Live A/B against the REFERENCE implementation (/root/reference).

The published golden tarballs are unreachable in this sandbox (zero egress —
TODO.md), but the reference's own code is mounted read-only and its one
missing dependency is scanpy, which tests/_reference_shim/scanpy.py provides
(IO via cnmf_tpu's codec; normalize/scale math implemented independently on
numpy/scipy/sklearn). That makes a DIRECT end-to-end A/B possible: run the
actual reference cNMF and this framework on identical synthetic counts with
identical seeds and compare every artifact — the strongest available
substitute for the blocked golden fixtures, and strictly stronger than the
self-generated goldens (tests/test_golden.py), whose inputs this codebase
produced.

Comparisons mirror tests/test_reproducibility.py in the reference:
prepare artifacts exactly / by RMS, per-(K, iter) factorize spectra, and the
consensus artifact set at summed squared error < 1e-4
(test_reproducibility.py:12,112). Our run uses compute_dtype=float64 + host
init (the CPU default), which the kernel tests pin to sklearn at 1e-6."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

import matplotlib

matplotlib.use("Agg")

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz, save_df_to_npz
from cnmf_tpu.io.h5ad import read_h5ad

REF_MODULE = "/root/reference/src/cnmf/cnmf.py"
SSE_TOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_MODULE):
        pytest.skip("reference checkout not mounted")
    shim = os.path.join(os.path.dirname(__file__), "_reference_shim")
    sys.path.insert(0, shim)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_cnmf", REF_MODULE
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(shim)
    return mod


@pytest.fixture(scope="module")
def runs(ref, tmp_path_factory):
    """One reference run + one cnmf_tpu run on identical inputs/seeds."""
    tmp = tmp_path_factory.mktemp("ab")
    rng = np.random.RandomState(31)
    n_cells, n_genes, k_true = 220, 320, 5
    W = rng.gamma(0.7, 1.0, size=(n_cells, k_true))
    H = rng.gamma(0.5, 1.0, size=(k_true, n_genes)) * (
        rng.rand(k_true, n_genes) < 0.3
    )
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X,
        index=[f"cell{i}" for i in range(n_cells)],
        columns=[f"gene{j}" for j in range(n_genes)],
    )
    counts_fn = str(tmp / "counts.df.npz")
    save_df_to_npz(df, counts_fn)

    cfg = dict(components=[5, 6], n_iter=8, seed=14, num_highvar_genes=150)

    a = ref.cNMF(output_dir=str(tmp), name="ref")
    a.prepare(counts_fn=counts_fn, **cfg)
    a.factorize(worker_i=0, total_workers=1)
    a.combine()
    a.consensus(k=5, density_threshold=0.5, show_clustering=False,
                close_clustergram_fig=True)

    b = cNMF(output_dir=str(tmp), name="tpu", compute_dtype=np.float64)
    b.prepare(counts_fn=counts_fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)
    b.combine()
    b.consensus(k=5, density_threshold=0.5, show_clustering=False,
                close_clustergram_fig=True)
    return a, b


def test_prepare_artifacts_match(runs):
    a, b = runs
    # HVG list: exact equality (reference test :146-155)
    ga = open(a.paths["nmf_genes_list"]).read().split()
    gb = open(b.paths["nmf_genes_list"]).read().split()
    assert ga == gb
    # replicate grid: exact on the seed-bearing columns (:160-165)
    pa = load_df_from_npz(a.paths["nmf_replicate_parameters"])
    pb = load_df_from_npz(b.paths["nmf_replicate_parameters"])
    for col in ["n_components", "iter", "nmf_seed"]:
        np.testing.assert_array_equal(pa[col].values, pb[col].values)
    # tpm_stats by RMS (:167-172)
    sa = load_df_from_npz(a.paths["tpm_stats"]).values.astype(np.float64)
    sb = load_df_from_npz(b.paths["tpm_stats"]).values.astype(np.float64)
    assert np.sqrt(np.mean((sa - sb) ** 2)) < 1e-10
    # norm_counts h5ad: same shape, matching values (:128-144). The
    # reference stores df-sourced runs sparse (cnmf.py:398-400) while this
    # framework keeps them dense (io/loaders.py — deliberate, values equal)
    import scipy.sparse as sp

    na = read_h5ad(a.paths["normalized_counts"])
    nb = read_h5ad(b.paths["normalized_counts"])
    assert na.X.shape == nb.X.shape
    assert list(na.var.index) == list(nb.var.index)
    da = np.asarray(na.X.todense() if sp.issparse(na.X) else na.X, np.float64)
    db = np.asarray(nb.X.todense() if sp.issparse(nb.X) else nb.X, np.float64)
    np.testing.assert_allclose(da, db, rtol=1e-10, atol=1e-12)
    # YAML solver kwargs deep-equal (:178-188)
    import yaml

    ya = yaml.safe_load(open(a.paths["nmf_run_parameters"]))
    yb = yaml.safe_load(open(b.paths["nmf_run_parameters"]))
    assert ya == yb


def test_factorize_spectra_match(runs):
    a, b = runs
    pa = load_df_from_npz(a.paths["nmf_replicate_parameters"])
    for _, row in pa.iterrows():
        k, it = int(row["n_components"]), int(row["iter"])
        sa = load_df_from_npz(a.paths["iter_spectra"] % (k, it))
        sb = load_df_from_npz(b.paths["iter_spectra"] % (k, it))
        assert list(sa.columns) == list(sb.columns)
        sse = float(((sa.values - sb.values) ** 2).sum())
        assert sse < SSE_TOL, f"k={k} iter={it}: spectra SSE {sse}"


def test_consensus_artifacts_match(runs):
    a, b = runs
    for key in [
        "consensus_spectra",
        "consensus_usages",
        "gene_spectra_tpm",
        "gene_spectra_score",
        "starcat_spectra",
    ]:
        fa = load_df_from_npz(a.paths[key] % (5, "0_5"))
        fb = load_df_from_npz(b.paths[key] % (5, "0_5"))
        assert fa.shape == fb.shape, key
        va = fa.values.astype(np.float64)
        vb = fb.values.astype(np.float64)
        # RELATIVE SSE: gene_spectra_tpm carries TPM-unit values up to ~1e5
        # per entry, where the reference suite's absolute 1e-4 only makes
        # sense for same-implementation regression. Measured agreement here
        # is ~1e-11 relative across every artifact.
        sse = float(np.nansum((va - vb) ** 2))
        rel = sse / max(float(np.nansum(va ** 2)), 1e-30)
        assert rel < SSE_TOL, f"{key}: relative SSE {rel} (abs {sse})"


def test_kl_factorize_matches_reference(ref, tmp_path):
    """beta!=2 (KL multiplicative updates) against the live reference —
    the MU solver path's first cross-implementation check (reference
    cnmf.py:618-627 builds the sklearn 'mu' kwargs)."""
    rng = np.random.RandomState(7)
    W = rng.gamma(0.7, 1.0, size=(120, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 180)) * (rng.rand(4, 180) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(180)])
    counts_fn = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts_fn)
    cfg = dict(components=[4], n_iter=3, seed=9, num_highvar_genes=100,
               beta_loss="kullback-leibler", max_NMF_iter=400)

    a = ref.cNMF(output_dir=str(tmp_path), name="ref_kl")
    a.prepare(counts_fn=counts_fn, **cfg)
    a.factorize(worker_i=0, total_workers=1)

    b = cNMF(output_dir=str(tmp_path), name="tpu_kl",
             compute_dtype=np.float64)
    b.prepare(counts_fn=counts_fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    for it in range(3):
        sa = load_df_from_npz(a.paths["iter_spectra"] % (4, it)).values
        sb = load_df_from_npz(b.paths["iter_spectra"] % (4, it)).values
        sse = float(((sa - sb) ** 2).sum())
        rel = sse / float((sa ** 2).sum())
        assert rel < SSE_TOL, f"KL iter {it}: relative SSE {rel}"


def test_nndsvd_factorize_matches_reference(ref, tmp_path):
    """init='nndsvd' against the live reference: sklearn's nndsvd uses a
    SEEDED randomized SVD, so restarts differ per replicate — the inits
    must match bit-for-bit and the CD solves to solver tolerance."""
    rng = np.random.RandomState(21)
    W = rng.gamma(0.7, 1.0, size=(100, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 150)) * (rng.rand(4, 150) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(100)],
                      columns=[f"g{j}" for j in range(150)])
    counts_fn = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts_fn)
    cfg = dict(components=[4], n_iter=3, seed=11, num_highvar_genes=90,
               init="nndsvd", max_NMF_iter=300)

    a = ref.cNMF(output_dir=str(tmp_path), name="ref_nnd")
    a.prepare(counts_fn=counts_fn, **cfg)
    a.factorize(worker_i=0, total_workers=1)

    b = cNMF(output_dir=str(tmp_path), name="tpu_nnd",
             compute_dtype=np.float64)
    b.prepare(counts_fn=counts_fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    for it in range(3):
        sa = load_df_from_npz(a.paths["iter_spectra"] % (4, it)).values
        sb = load_df_from_npz(b.paths["iter_spectra"] % (4, it)).values
        sse = float(((sa - sb) ** 2).sum())
        rel = sse / float((sa ** 2).sum())
        assert rel < SSE_TOL, f"nndsvd iter {it}: relative SSE {rel}"


def test_consensus_option_variants_match(runs):
    """Non-default consensus options on the SAME factorize artifacts:
    no density filter (dt=2.0), refit_usage=False, normalize_tpm_spectra —
    reference cnmf.py:823-985 option forks."""
    a, b = runs
    kw = dict(density_threshold=2.0, refit_usage=False,
              normalize_tpm_spectra=True, show_clustering=False,
              close_clustergram_fig=True)
    a.consensus(k=6, **kw)
    b.consensus(k=6, **kw)
    for key in ["consensus_spectra", "consensus_usages", "gene_spectra_tpm",
                "gene_spectra_score"]:
        fa = load_df_from_npz(a.paths[key] % (6, "2_0"))
        fb = load_df_from_npz(b.paths[key] % (6, "2_0"))
        va = fa.values.astype(np.float64)
        vb = fb.values.astype(np.float64)
        rel = float(np.nansum((va - vb) ** 2)) / max(
            float(np.nansum(va ** 2)), 1e-30
        )
        assert rel < SSE_TOL, f"{key} (dt=2, no-refit, norm-tpm): {rel}"


def test_regularized_factorize_matches_reference(ref, tmp_path):
    """Nonzero alpha_usage/alpha_spectra (sklearn alpha_W/alpha_H L2 regs —
    reference prepare cnmf.py:333 kwargs → get_nmf_iter_params:618-631):
    the regularization scaling paths get a live cross-check."""
    rng = np.random.RandomState(17)
    W = rng.gamma(0.7, 1.0, size=(110, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 160)) * (rng.rand(4, 160) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(110)],
                      columns=[f"g{j}" for j in range(160)])
    counts_fn = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts_fn)
    cfg = dict(components=[4], n_iter=3, seed=8, num_highvar_genes=100,
               alpha_usage=0.02, alpha_spectra=0.01)

    a = ref.cNMF(output_dir=str(tmp_path), name="ref_reg")
    a.prepare(counts_fn=counts_fn, **cfg)
    a.factorize(worker_i=0, total_workers=1)

    b = cNMF(output_dir=str(tmp_path), name="tpu_reg",
             compute_dtype=np.float64)
    b.prepare(counts_fn=counts_fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    import yaml

    ya = yaml.safe_load(open(a.paths["nmf_run_parameters"]))
    yb = yaml.safe_load(open(b.paths["nmf_run_parameters"]))
    assert ya == yb
    for it in range(3):
        sa = load_df_from_npz(a.paths["iter_spectra"] % (4, it)).values
        sb = load_df_from_npz(b.paths["iter_spectra"] % (4, it)).values
        rel = float(((sa - sb) ** 2).sum()) / float((sa ** 2).sum())
        assert rel < SSE_TOL, f"alpha'd iter {it}: relative SSE {rel}"


def test_sparse_h5ad_input_matches_reference(ref, tmp_path):
    """Sparse .h5ad counts through BOTH pipelines end-to-end: the
    reference's sparse forks (sparse Fano HVG stats, scanpy-scale zero-std
    guard, sparse TPM) against this framework's — consensus artifacts at
    1e-4 relative SSE."""
    import scipy.sparse as sp

    from cnmf_tpu.io.anndata_lite import AnnData
    from cnmf_tpu.io.h5ad import write_h5ad

    rng = np.random.RandomState(27)
    W = rng.gamma(0.7, 1.0, size=(150, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 220)) * (rng.rand(5, 220) < 0.25)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    ad = AnnData(
        X=sp.csr_matrix(X),
        obs=pd.DataFrame(index=[f"c{i}" for i in range(150)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(220)]),
    )
    counts_fn = str(tmp_path / "counts.h5ad")
    write_h5ad(counts_fn, ad)
    cfg = dict(components=[5], n_iter=6, seed=5, num_highvar_genes=120)

    a = ref.cNMF(output_dir=str(tmp_path), name="ref_sp")
    a.prepare(counts_fn=counts_fn, **cfg)
    a.factorize(worker_i=0, total_workers=1)
    a.combine()
    a.consensus(k=5, density_threshold=0.5, show_clustering=False,
                close_clustergram_fig=True)

    b = cNMF(output_dir=str(tmp_path), name="tpu_sp",
             compute_dtype=np.float64)
    b.prepare(counts_fn=counts_fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)
    b.combine()
    b.consensus(k=5, density_threshold=0.5, show_clustering=False,
                close_clustergram_fig=True)

    ga = open(a.paths["nmf_genes_list"]).read().split()
    gb = open(b.paths["nmf_genes_list"]).read().split()
    assert ga == gb
    for key in ["consensus_spectra", "consensus_usages", "gene_spectra_tpm",
                "gene_spectra_score", "starcat_spectra"]:
        fa = load_df_from_npz(a.paths[key] % (5, "0_5"))
        fb = load_df_from_npz(b.paths[key] % (5, "0_5"))
        va = fa.values.astype(np.float64)
        vb = fb.values.astype(np.float64)
        rel = float(np.nansum((va - vb) ** 2)) / max(
            float(np.nansum(va ** 2)), 1e-30
        )
        assert rel < SSE_TOL, f"sparse {key}: relative SSE {rel}"


def test_k_selection_plot_matches_reference(runs):
    """The full k_selection_plot command on both pipelines (reference
    cnmf.py:1119-1158): same stats table (k, dt-forced-'2', silhouette,
    prediction error) in the same npz artifact, PNG written."""
    import matplotlib.pyplot as plt

    a, b = runs
    a.k_selection_plot()
    plt.close("all")
    b.k_selection_plot(close_fig=True)
    sa = load_df_from_npz(a.paths["k_selection_stats"])
    sb = load_df_from_npz(b.paths["k_selection_stats"])
    assert list(sa.columns) == list(sb.columns)
    va = sa.values.astype(np.float64)
    vb = sb.values.astype(np.float64)
    np.testing.assert_allclose(va[:, :2], vb[:, :2])          # k, threshold
    np.testing.assert_allclose(va[:, 2], vb[:, 2], rtol=1e-4)  # silhouette
    np.testing.assert_allclose(va[:, 3], vb[:, 3], rtol=1e-4)  # pred error
    import os

    assert os.path.exists(a.paths["k_selection_plot"])
    assert os.path.exists(b.paths["k_selection_plot"])


def test_load_results_matches_reference(runs):
    """load_results (reference cnmf.py:1161-1210): same top-gene tables,
    normalized usages and transposed spectra from the same artifacts."""
    a, b = runs
    ua, sa, ta, ga = a.load_results(K=5, density_threshold=0.5,
                                    n_top_genes=25)
    ub, sb, tb, gb = b.load_results(K=5, density_threshold=0.5,
                                    n_top_genes=25)
    # tolerances at the pipeline's artifact contract (1e-4-level): the
    # inputs load_results reads already differ by the consensus solves'
    # ~1e-5 cross-implementation drift
    np.testing.assert_allclose(ua.values, ub.values, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(sa.values, sb.values, rtol=1e-3, atol=1e-6)
    rel = float(((ta.values - tb.values) ** 2).sum()) / float(
        (ta.values ** 2).sum()
    )
    assert rel < SSE_TOL, f"tpm spectra: relative SSE {rel}"
    assert (np.asarray(ga.values) == np.asarray(gb.values)).mean() > 0.95


def test_k_selection_stats_match(runs):
    a, b = runs
    sa = a.consensus(k=5, skip_density_and_return_after_stats=True,
                     show_clustering=False)
    sb = b.consensus(k=5, skip_density_and_return_after_stats=True,
                     show_clustering=False)
    va = np.asarray(sa.values, np.float64).ravel()
    vb = np.asarray(sb.values, np.float64).ravel()
    # [k, threshold, silhouette, prediction_error]
    np.testing.assert_allclose(va[:3], vb[:3], rtol=1e-4)
    assert abs(va[3] - vb[3]) / va[3] < 1e-4
