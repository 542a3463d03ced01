"""Preprocess layer tests: filtering, seurat_v3 HVG, Harmony correction,
CITE-seq splitting (reference preprocess.py behaviors)."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cnmf_tpu import AnnData, Preprocess
from cnmf_tpu.ops.hvg_seurat import highly_variable_genes_seurat_v3, loess_fit


def make_batched_adata(n_per_batch=150, n_genes=120, seed=0, shift_genes=30):
    """Two batches; the second has a strong additive shift on a gene block."""
    rng = np.random.RandomState(seed)
    k = 4
    W = rng.gamma(1.0, 1.0, size=(2 * n_per_batch, k))
    H = rng.gamma(1.0, 1.0, size=(k, n_genes)) * (rng.rand(k, n_genes) < 0.4)
    lam = W @ H + 0.5
    # moderate multiplicative batch effect — strong enough to separate batches
    # but leaving shared structure so clusters can mix (a fully batch-exclusive
    # shift is uncorrectable by the MOE ridge, for Harmony itself too)
    lam[n_per_batch:, :shift_genes] *= 2.5
    X = rng.poisson(lam).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    obs = pd.DataFrame(
        {"batch": ["a"] * n_per_batch + ["b"] * n_per_batch},
        index=[f"c{i}" for i in range(2 * n_per_batch)],
    )
    var = pd.DataFrame(index=[f"g{j}" for j in range(n_genes)])
    return AnnData(sp.csr_matrix(X), obs=obs, var=var)


def test_filter_adata():
    rng = np.random.RandomState(3)
    X = rng.poisson(5.0, size=(60, 40)).astype(float)
    X[:, 5] = 0.0          # undetected gene
    X[:55, 7] = 0.0        # gene in <10 cells
    X[4, :] = 0.0
    X[4, 0] = 3            # low-count cell
    var = pd.DataFrame(index=[f"g{j}" if j != 9 else "weird.gene" for j in range(40)])
    adata = AnnData(sp.csr_matrix(X), var=var)
    pp = Preprocess(random_seed=0)
    out = pp.filter_adata(adata, min_cells_per_gene=10, min_counts_per_cell=50,
                          filter_dot_genes=True, makeplots=False)
    assert "g5" not in out.var.index
    assert "g7" not in out.var.index
    assert "weird.gene" not in out.var.index
    assert out.n_obs < 60
    assert "n_counts" in out.obs.columns


def test_loess_fit_recovers_smooth_function():
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(-2, 2, 400))
    y_true = 1.5 + 0.7 * x - 0.3 * x**2
    y = y_true + rng.normal(0, 0.05, 400)
    fitted = loess_fit(x, y, span=0.3, degree=2)
    assert np.max(np.abs(fitted - y_true)) < 0.15


def test_seurat_v3_hvg_picks_variable_genes():
    rng = np.random.RandomState(1)
    n, g = 400, 200
    base = rng.poisson(3.0, size=(n, g)).astype(float)
    # plant 20 overdispersed genes: same mean (~3) but bimodal 0/Poisson(6),
    # i.e. extra variance the mean-variance trend cannot absorb
    base[:, :20] = rng.poisson(6.0, size=(n, 20)) * (rng.rand(n, 20) < 0.5)
    mask, norm_var = highly_variable_genes_seurat_v3(sp.csr_matrix(base), n_top_genes=25)
    assert mask.sum() == 25
    assert mask[:20].sum() >= 18  # planted genes dominate the selection
    # sparse and dense paths agree
    mask_d, norm_var_d = highly_variable_genes_seurat_v3(base, n_top_genes=25)
    np.testing.assert_allclose(norm_var, norm_var_d, rtol=1e-10)
    assert (mask == mask_d).all()


def test_harmony_reduces_batch_effect():
    adata = make_batched_adata()
    X_raw = np.asarray(adata.X.todense())
    batch = (adata.obs["batch"] == "b").values

    pp = Preprocess(random_seed=0)
    corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
        adata, harmony_vars=["batch"], n_top_rna_genes=60,
        makeplots=False, max_iter_harmony=5,
    )
    Xc = corrected.X if not sp.issparse(corrected.X) else corrected.X.toarray()
    assert (Xc >= 0).all()
    assert Xc.shape == (adata.n_obs, 60)
    assert len(hvgs) == 60

    # batch-centroid separation, normalized by pooled std, must shrink vs the
    # uncorrected scaled HVG matrix
    hv_idx = adata.var.index.get_indexer(hvgs)
    X_hvg = X_raw[:, hv_idx]
    X_hvg = X_hvg / X_hvg.std(axis=0, ddof=1)

    def sep(M):
        d = M[batch].mean(0) - M[~batch].mean(0)
        s = M.std(0) + 1e-9
        return float(np.linalg.norm(d / s))

    assert sep(Xc) < 0.7 * sep(X_hvg)


def test_citeseq_split_and_stack():
    adata = make_batched_adata(n_per_batch=80, n_genes=60)
    rng = np.random.RandomState(5)
    adt = AnnData(
        sp.csr_matrix(rng.poisson(50.0, size=(adata.n_obs, 10)).astype(float)),
        obs=adata.obs.copy(),
        var=pd.DataFrame(index=[f"adt{j}" for j in range(10)]),
    )
    pp = Preprocess(random_seed=0)
    corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
        [adata, adt], n_top_rna_genes=30, makeplots=False,
    )
    assert tp10k.shape == (adata.n_obs, 60 + 10)
    assert list(tp10k.var.index[-10:]) == [f"adt{j}" for j in range(10)]
    # RNA and ADT each library-normalized separately in tp10k
    rna_part = np.asarray(tp10k.X.tocsc()[:, :60].sum(axis=1)).ravel()
    adt_part = np.asarray(tp10k.X.tocsc()[:, 60:].sum(axis=1)).ravel()
    np.testing.assert_allclose(rna_part, 1e4, rtol=1e-6)
    np.testing.assert_allclose(adt_part, 1e4, rtol=1e-6)


def test_select_features_mi():
    adata = make_batched_adata(n_per_batch=60, n_genes=40)
    cluster = (adata.obs["batch"] == "b").astype(int).values
    pp = Preprocess(random_seed=0)
    out = pp.select_features_MI(adata, cluster, n_top_features=10, makeplots=False)
    assert out.var["highly_variable"].sum() == 10
    # the batch-shifted gene block carries the MI signal
    top = set(out.var.index[out.var["highly_variable"]])
    shifted = {f"g{j}" for j in range(30)}
    assert len(top & shifted) >= 5


def test_harmony_deterministic():
    from cnmf_tpu import harmony as hm

    rng = np.random.RandomState(1)
    Z = rng.normal(0, 1, size=(200, 12)).astype(np.float32)
    batch = np.array(["a", "b"] * 100)
    Z[batch == "b"] += 1.0
    obs = pd.DataFrame({"batch": batch})
    r1 = hm.run_harmony(Z, obs, ["batch"], max_iter_harmony=3, random_state=0)
    r2 = hm.run_harmony(Z, obs, ["batch"], max_iter_harmony=3, random_state=0)
    np.testing.assert_array_equal(r1.Z_corr, r2.Z_corr)
    np.testing.assert_array_equal(r1.R, r2.R)


def test_citeseq_feature_type_col_split():
    """Single AnnData with a feature-type column splits RNA/ADT
    (reference preprocess.py:210-213)."""
    adata = make_batched_adata(n_per_batch=60, n_genes=50)
    rng = np.random.RandomState(2)
    adt = rng.poisson(40.0, size=(adata.n_obs, 8)).astype(float)
    X = sp.hstack([adata.X, sp.csr_matrix(adt)]).tocsr()
    var = pd.DataFrame(
        {"feature_types": ["Gene Expression"] * 50 + ["Antibody Capture"] * 8},
        index=list(adata.var.index) + [f"ab{j}" for j in range(8)],
    )
    both = AnnData(X, obs=adata.obs.copy(), var=var)
    pp = Preprocess(random_seed=0)
    corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
        both, feature_type_col="feature_types", n_top_rna_genes=20,
        makeplots=False,
    )
    assert corrected.shape[1] == 20
    assert tp10k.shape[1] == 50 + 8
    assert all(not h.startswith("ab") for h in hvgs)


def test_exclude_genes_removed_from_hvgs_kept_in_tp10k():
    adata = make_batched_adata(n_per_batch=60, n_genes=50)
    pp = Preprocess(random_seed=0)
    corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
        adata, n_top_rna_genes=20, exclude_genes=["g0", "g1", "g2"],
        makeplots=False,
    )
    assert not ({"g0", "g1", "g2"} & set(hvgs))
    assert {"g0", "g1", "g2"} <= set(tp10k.var.index)


def test_stdscale_max_value_ceiling():
    from cnmf_tpu.preprocess import stdscale_quantile_celing

    rng = np.random.RandomState(0)
    X = rng.gamma(2.0, 3.0, size=(80, 30))
    adata = AnnData(sp.csr_matrix(X))
    stdscale_quantile_celing(adata, max_value=1.5, quantile_thresh=None)
    vals = adata.X.toarray() if sp.issparse(adata.X) else np.asarray(adata.X)
    assert vals.max() <= 1.5 + 1e-9


def test_sparse_quantile_matches_dense_materialization():
    """The zero-aware global quantile must equal np.quantile of the fully
    densified matrix (the reference's computation) across quantiles landing
    in the zero block, at its edges, and among the positives."""
    from cnmf_tpu.preprocess import _quantile_with_zeros, stdscale_quantile_celing

    rng = np.random.RandomState(2)
    S = sp.random(70, 40, density=0.3, random_state=rng, format="csr")
    S.data = rng.gamma(2.0, 1.0, size=S.nnz)
    dense_flat = np.asarray(S.todense()).reshape(-1)
    for q in [0.05, 0.5, 0.69, 0.7, 0.71, 0.95, 0.9999, 1.0]:
        ref = np.quantile(dense_flat, q)
        got = _quantile_with_zeros(
            S.data.astype(np.float64), S.shape[0] * S.shape[1] - S.nnz, q
        )
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12,
                                   err_msg=f"q={q}")
    # negatives path (general helper contract, not reached by scaled counts)
    data = np.array([-3.0, -1.0, 2.0, 5.0])
    virtual = np.sort(np.concatenate([data, np.zeros(4)]))
    for q in [0.0, 0.2, 0.45, 0.8, 1.0]:
        np.testing.assert_allclose(
            _quantile_with_zeros(data, 4, q), np.quantile(virtual, q)
        )
    # a negative threshold must pull implicit zeros down too (degenerate
    # branch; matrices with negative stored values only)
    from cnmf_tpu.io.anndata_lite import AnnData as AD
    import cnmf_tpu.preprocess as pp_mod
    neg = sp.csr_matrix(np.array([[-5.0, 0.0], [0.0, -2.0]]))
    ad_neg = AD(neg.copy())
    orig_scale = pp_mod.scale_unit_variance
    pp_mod.scale_unit_variance = lambda X, **kw: X  # isolate the clamp
    try:
        stdscale_quantile_celing(ad_neg, quantile_thresh=0.1)
    finally:
        pp_mod.scale_unit_variance = orig_scale
    dense_ref = np.minimum(
        neg.toarray(), np.quantile(neg.toarray().reshape(-1), 0.1)
    )
    got_neg = ad_neg.X.toarray() if sp.issparse(ad_neg.X) else np.asarray(ad_neg.X)
    np.testing.assert_allclose(got_neg, dense_ref)
    # end-to-end: sparse ceiling equals the dense-materialized ceiling
    adata_sp = AnnData(S.copy())
    adata_dn = AnnData(np.asarray(S.todense()))
    stdscale_quantile_celing(adata_sp, quantile_thresh=0.98)
    stdscale_quantile_celing(adata_dn, quantile_thresh=0.98)
    np.testing.assert_allclose(
        np.asarray(adata_sp.X.todense()), np.asarray(adata_dn.X), rtol=1e-6,
        atol=1e-9,
    )


def test_normalize_librarysize_path():
    adata = make_batched_adata(n_per_batch=60, n_genes=50)
    pp = Preprocess(random_seed=0)
    out, hvgs = pp.normalize_batchcorrect(
        adata, normalize_librarysize=True, n_top_genes=15, makeplots=False,
    )
    assert out.shape[1] == 15 and len(hvgs) == 15
