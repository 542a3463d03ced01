"""End-to-end numerical regression: our consensus vs a sklearn/numpy oracle.

The reference has no unit tests for consensus internals — its regression test
copies golden merged-spectra files and checks consensus outputs at SSE < 1e-4
(reference tests/test_reproducibility.py:12,85-115). Golden tarballs need
network access, so the oracle here re-derives the reference's consensus math
(reference cnmf.py:823-1116) directly with sklearn/numpy on the same merged
spectra our factorize produced, and compares every saved artifact.
"""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from sklearn.cluster import KMeans
from sklearn.decomposition import non_negative_factorization
from sklearn.metrics.pairwise import euclidean_distances

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz
from cnmf_tpu.io.h5ad import read_h5ad

K = 6
DT = 0.5
DT_REPL = "0_5"
SSE_TOL = 1e-4


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    """Run our pipeline end-to-end on synthetic data with planted programs."""
    tmp_path = tmp_path_factory.mktemp("consensus")
    rng = np.random.RandomState(42)
    n_cells, n_genes, k_true = 250, 300, K
    W = rng.gamma(0.7, 1.0, size=(n_cells, k_true))
    H = rng.gamma(0.5, 1.0, size=(k_true, n_genes)) * (rng.rand(k_true, n_genes) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X,
        index=[f"cell{i}" for i in range(n_cells)],
        columns=[f"gene{j}" for j in range(n_genes)],
    )
    counts_fn = str(tmp_path / "counts.txt")
    df.to_csv(counts_fn, sep="\t")

    obj = cNMF(output_dir=str(tmp_path), name="oracle", compute_dtype=np.float64)
    obj.prepare(counts_fn=counts_fn, components=[K], n_iter=12, seed=14,
                num_highvar_genes=150)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=K, density_threshold=DT, show_clustering=False,
                  close_clustergram_fig=True)
    return obj


def oracle_consensus(obj):
    """Re-derive the reference's consensus (cnmf.py:823-1116) with sklearn."""
    merged = load_df_from_npz(obj.paths["merged_spectra"] % K)
    norm_counts = read_h5ad(obj.paths["normalized_counts"])
    tpm = read_h5ad(obj.paths["tpm"])
    tpm_stats = load_df_from_npz(obj.paths["tpm_stats"])
    import yaml
    nmf_kwargs = yaml.load(open(obj.paths["nmf_run_parameters"]), Loader=yaml.FullLoader)

    n_neighbors = int(0.30 * merged.shape[0] / K)
    l2 = (merged.T / np.sqrt((merged**2).sum(axis=1))).T

    dist = euclidean_distances(l2.values)
    order = np.argpartition(dist, n_neighbors + 1)[:, : n_neighbors + 1]
    knn = dist[np.arange(dist.shape[0])[:, None], order]
    local_density = pd.Series(knn.sum(1) / n_neighbors, index=l2.index)

    keep = local_density < DT
    l2f = l2.loc[keep]

    km = KMeans(n_clusters=K, n_init=10, random_state=1)
    km.fit(l2f.values)
    labels = pd.Series(km.labels_ + 1, index=l2f.index)

    median_spectra = l2f.groupby(labels).median()
    median_spectra = (median_spectra.T / median_spectra.sum(1)).T

    def sk_refit_usage(Xm, spectra):
        kw = dict(nmf_kwargs)
        kw.update(dict(n_components=spectra.shape[0],
                       H=np.ascontiguousarray(spectra, dtype=np.float64),
                       update_H=False))
        W, _, _ = non_negative_factorization(
            np.asarray(Xm, dtype=np.float64), **kw
        )
        return W

    Xd = norm_counts.X.toarray() if sp.issparse(norm_counts.X) else np.asarray(norm_counts.X)
    rf = pd.DataFrame(sk_refit_usage(Xd, median_spectra.values),
                      index=norm_counts.obs.index, columns=median_spectra.index)

    norm_usages = rf.div(rf.sum(axis=1), axis=0)
    reorder = norm_usages.sum(axis=0).sort_values(ascending=False)
    rf = rf.loc[:, reorder.index]
    norm_usages = norm_usages.loc[:, reorder.index]
    median_spectra = median_spectra.loc[reorder.index, :]
    rf.columns = np.arange(1, K + 1)
    norm_usages.columns = rf.columns
    median_spectra.index = rf.columns

    tpm_X = tpm.X.toarray() if sp.issparse(tpm.X) else np.asarray(tpm.X)
    spectra_tpm = pd.DataFrame(
        sk_refit_usage(tpm_X.T, norm_usages.values.T).T,
        index=rf.columns, columns=tpm.var.index,
    )

    # z-score OLS (reference cnmf.py:55-125)
    meanY = tpm_X.mean(axis=0)
    varY = np.maximum(tpm_X.var(axis=0), 1e-12)
    Z = (tpm_X - meanY) / np.sqrt(varY)
    U = rf.values
    beta, *_ = np.linalg.lstsq(U.T @ U, U.T @ Z, rcond=None)
    usage_coef = pd.DataFrame(beta, index=rf.columns, columns=tpm.var.index)

    # final refit on std-scaled HVG TPM
    hvgs = open(obj.paths["nmf_genes_list"]).read().split("\n")
    tpm_hvg = tpm_X[:, tpm.var.index.get_indexer(hvgs)]
    norm_tpm = tpm_hvg / tpm_hvg.std(axis=0, ddof=1)
    tpm_stats.index = tpm.var.index
    spectra_rf = spectra_tpm.loc[:, hvgs].div(tpm_stats.loc[hvgs, "__std"], axis=1)
    rf_final = pd.DataFrame(
        sk_refit_usage(norm_tpm, spectra_rf.values),
        index=norm_counts.obs.index, columns=spectra_rf.index,
    )

    return dict(
        consensus_spectra=median_spectra,
        consensus_usages=rf_final,
        gene_spectra_tpm=spectra_tpm,
        gene_spectra_score=usage_coef,
        local_density=local_density,
    )


def sse(a, b):
    return float(((np.asarray(a, dtype=float) - np.asarray(b, dtype=float)) ** 2).sum())


def test_local_density_matches(run):
    oracle = oracle_consensus(run)
    ours = load_df_from_npz(run.paths["local_density_cache"] % K)
    assert sse(ours.values.ravel(), oracle["local_density"].values) < SSE_TOL


@pytest.mark.parametrize("artifact", [
    "consensus_spectra", "consensus_usages", "gene_spectra_tpm", "gene_spectra_score",
])
def test_consensus_artifacts_match_oracle(run, artifact):
    oracle = oracle_consensus(run)
    ours = load_df_from_npz(run.paths[artifact] % (K, DT_REPL))
    ref = oracle[artifact]
    assert list(ours.index) == list(ref.index)
    assert ours.shape == ref.shape
    err = sse(ours.values, ref.values)
    scale = max(float((np.asarray(ref.values, dtype=float) ** 2).sum()), 1.0)
    assert err / scale < SSE_TOL, f"{artifact}: relative SSE {err/scale:.2e}"


def test_starcat_reference(run):
    """starCAT spectra derive from the txt round-trip of gene_spectra_tpm
    (reference cnmf.py:1098-1116)."""
    ours = load_df_from_npz(run.paths["starcat_spectra"] % (K, DT_REPL))
    tpm_txt = pd.read_csv(
        run.paths["gene_spectra_tpm__txt"] % (K, DT_REPL), index_col=0, sep="\t"
    )
    tpm_stats = load_df_from_npz(run.paths["tpm_stats"])
    tpm_stats.index = tpm_txt.columns
    renorm = tpm_txt.div(tpm_txt.sum(axis=1), axis=0) * 1e6
    varnorm = renorm.div(tpm_stats["__std"])
    hvgs = open(run.paths["nmf_genes_list"]).read().split("\n")
    expected = varnorm[hvgs]
    assert list(ours.index) == [f"GEP{i}" for i in expected.index]
    assert sse(ours.values, expected.values) / max(
        float((expected.values**2).sum()), 1.0
    ) < SSE_TOL


def test_kl_mu_consensus_refits_match_sklearn(tmp_path):
    """Consensus under solver='mu' (KL loss): the NNLS refit path must match
    sklearn's update_H=False MU semantics end-to-end (small config)."""
    import yaml

    rng = np.random.RandomState(8)
    W = rng.gamma(0.7, 1.0, size=(120, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 150)) * (rng.rand(4, 150) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(150)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    obj = cNMF(output_dir=str(tmp_path), name="klmu", compute_dtype=np.float64)
    obj.prepare(counts_fn=fn, components=[4], n_iter=5, seed=3,
                num_highvar_genes=80, beta_loss="kullback-leibler",
                max_NMF_iter=300)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)

    # oracle: sklearn MU refit of usages on the same median spectra
    nmf_kwargs = yaml.load(open(obj.paths["nmf_run_parameters"]),
                           Loader=yaml.FullLoader)
    assert nmf_kwargs["solver"] == "mu"
    spectra = load_df_from_npz(obj.paths["consensus_spectra"] % (4, "2_0"))
    norm_counts = read_h5ad(obj.paths["normalized_counts"])
    Xd = norm_counts.X.toarray() if sp.issparse(norm_counts.X) else np.asarray(norm_counts.X)

    # reproduce the full post-refit chain as sklearn would
    kw = dict(nmf_kwargs)
    tpm = read_h5ad(obj.paths["tpm"])
    tpm_X = tpm.X.toarray() if sp.issparse(tpm.X) else np.asarray(tpm.X)
    hvgs = open(obj.paths["nmf_genes_list"]).read().split("\n")
    tpm_hvg = tpm_X[:, tpm.var.index.get_indexer(hvgs)]
    norm_tpm = tpm_hvg / tpm_hvg.std(axis=0, ddof=1)
    tpm_stats = load_df_from_npz(obj.paths["tpm_stats"])
    tpm_stats.index = tpm.var.index
    spectra_tpm = load_df_from_npz(obj.paths["gene_spectra_tpm"] % (4, "2_0"))
    spectra_rf = spectra_tpm.loc[:, hvgs].div(tpm_stats.loc[hvgs, "__std"], axis=1)
    W_sk, _, _ = non_negative_factorization(
        np.asarray(norm_tpm, dtype=np.float64),
        H=np.ascontiguousarray(spectra_rf.values, dtype=np.float64),
        n_components=4, update_H=False, init=None,
        solver="mu", beta_loss="kullback-leibler",
        tol=kw["tol"], max_iter=kw["max_iter"],
    )
    ours = load_df_from_npz(obj.paths["consensus_usages"] % (4, "2_0")).values
    err = sse(ours, W_sk)
    scale = max(float((W_sk**2).sum()), 1.0)
    assert err / scale < SSE_TOL, f"KL usages relative SSE {err/scale:.2e}"
