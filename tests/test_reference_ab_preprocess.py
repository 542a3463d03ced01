"""Live A/B of the Preprocess layer against the ACTUAL reference code.

Runs /root/reference/src/cnmf/preprocess.py (via the tests/_reference_shim
scanpy stand-in) next to cnmf_tpu.preprocess on identical inputs, over the
paths whose dependencies exist in this environment:

* ``filter_adata`` — gene/cell filters, mito fraction, dot-gene drop
  (reference preprocess.py:60-132);
* ``preprocess_for_cnmf`` with a PRE-SET ``highly_variable`` column
  (``n_top_rna_genes=None`` — the reference's documented escape from the
  scikit-misc seurat_v3 dependency, reference preprocess.py:316-317),
  covering the CITE-seq RNA/ADT split, tp10k, exclude_genes, the HVG
  subset + quantile-ceiling variance scaling, and the ADT hstack
  (reference preprocess.py:135-267).

The seurat_v3-HVG and harmonypy paths still need packages this environment
cannot install (no package index); they are covered by the independent
oracles in test_seurat_v3_margin.py / test_harmony_oracle.py instead.
"""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import matplotlib

matplotlib.use("Agg")

from cnmf_tpu.io.anndata_lite import AnnData
from cnmf_tpu.preprocess import Preprocess

REF_MODULE = "/root/reference/src/cnmf/preprocess.py"


@pytest.fixture(scope="module")
def ref_pp():
    if not os.path.exists(REF_MODULE):
        pytest.skip("reference checkout not mounted")
    shim = os.path.join(os.path.dirname(__file__), "_reference_shim")
    sys.path.insert(0, shim)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_preprocess", REF_MODULE
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(shim)
    return mod


def _cite_seq_counts(sparse=True, seed=23):
    """Synthetic CITE-seq counts: RNA genes (some 'MT-'/dot-named, some
    empty-ish) + ADT features, labeled via var['feature_types']."""
    rng = np.random.RandomState(seed)
    n_cells, n_rna, n_adt = 180, 240, 12
    W = rng.gamma(0.8, 1.0, size=(n_cells, 4))
    H = rng.gamma(0.5, 1.0, size=(4, n_rna)) * (rng.rand(4, n_rna) < 0.35)
    X_rna = rng.poisson(W @ H * 3.0).astype(np.float64)
    # a handful of near-empty genes / low-count cells so the filters bite
    X_rna[:, :6] = 0
    X_rna[:3, :] = (X_rna[:3, :] > 0) * 1.0
    X_adt = rng.poisson(rng.gamma(2.0, 20.0, size=(n_cells, n_adt)))
    X = np.hstack([X_rna, X_adt.astype(np.float64)])
    genes = (
        [f"MT-G{j}" for j in range(4)]
        + [f"GENE.{j}" for j in range(4, 10)]
        + [f"G{j}" for j in range(10, n_rna)]
        + [f"ADT{j}" for j in range(n_adt)]
    )
    var = pd.DataFrame(index=pd.Index(genes))
    var["feature_types"] = ["Gene Expression"] * n_rna + [
        "Antibody Capture"
    ] * n_adt
    obs = pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)]))
    if sparse:
        X = sp.csr_matrix(X)
    return X, obs, var


def _dense(X):
    return np.asarray(X.todense() if sp.issparse(X) else X, dtype=np.float64)


@pytest.mark.parametrize("sparse", [True, False])
def test_filter_adata_matches_reference(ref_pp, sparse):
    X, obs, var = _cite_seq_counts(sparse=sparse)
    kwargs = dict(
        filter_mito_thresh=0.2,
        min_cells_per_gene=10,
        min_counts_per_cell=50,
        filter_mito_genes=True,
        filter_dot_genes=True,
        makeplots=False,
    )
    a = ref_pp.Preprocess(random_seed=14).filter_adata(
        AnnData(X.copy(), obs.copy(), var.copy()), **kwargs
    )
    b = Preprocess(random_seed=14).filter_adata(
        AnnData(X.copy(), obs.copy(), var.copy()), **kwargs
    )
    assert list(a.obs.index) == list(b.obs.index)
    assert list(a.var.index) == list(b.var.index)
    np.testing.assert_allclose(_dense(a.X), _dense(b.X), rtol=0, atol=0)
    np.testing.assert_allclose(
        a.obs["n_counts"].values.astype(float),
        b.obs["n_counts"].values.astype(float),
    )


# CITE-seq runs sparse-only: the reference's ADT hstack is
# scipy.sparse.hstack (reference preprocess.py:257), which rejects dense
# blocks — real 10x CITE-seq input is CSR. The dense path is covered by the
# RNA-only test below.
@pytest.mark.parametrize("sparse", [True])
def test_preprocess_for_cnmf_matches_reference(ref_pp, sparse):
    X, obs, var = _cite_seq_counts(sparse=sparse)
    # pre-set HVG column (reference preprocess.py:316-317): deterministic
    # top-variance mask computed OUTSIDE both implementations
    Xd = _dense(X)
    rna = var["feature_types"].values == "Gene Expression"
    v = Xd[:, rna].var(axis=0)
    hv_rna = np.zeros(rna.sum(), dtype=bool)
    hv_rna[np.argsort(-v)[:80]] = True

    def make_input():
        ad = AnnData(X.copy(), obs.copy(), var.copy())
        hv = pd.Series(False, index=ad.var.index)
        hv.loc[ad.var.index[rna][hv_rna]] = True
        ad.var["highly_variable"] = hv.values
        return ad

    kwargs = dict(
        feature_type_col="feature_types",
        harmony_vars=None,
        n_top_rna_genes=None,
        librarysize_targetsum=1e4,
        quantile_thresh=0.9999,
        makeplots=False,
        exclude_genes=["G10", "G11", "NOT-A-GENE"],
    )
    rna_a, tp10k_a, hvgs_a = ref_pp.Preprocess(
        random_seed=14
    ).preprocess_for_cnmf(make_input(), **kwargs)
    rna_b, tp10k_b, hvgs_b = Preprocess(random_seed=14).preprocess_for_cnmf(
        make_input(), **kwargs
    )

    assert hvgs_a == hvgs_b
    assert list(rna_a.var.index) == list(rna_b.var.index)
    # corrected HVG varnorm matrix (the cNMF input)
    da, db = _dense(rna_a.X), _dense(rna_b.X)
    assert da.shape == db.shape
    np.testing.assert_allclose(da, db, rtol=1e-12, atol=1e-12)
    # tp10k (RNA ⊕ ADT): same genes, same normalized values
    assert list(tp10k_a.var.index) == list(tp10k_b.var.index)
    np.testing.assert_allclose(
        _dense(tp10k_a.X), _dense(tp10k_b.X), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("sparse", [True, False])
def test_select_features_MI_matches_reference(ref_pp, sparse):
    """ADT-panel MI feature selection (reference preprocess.py:425-473).
    Both implementations call sklearn's mutual_info_classif with
    random_state=None (global numpy RNG): re-seeding via Preprocess's own
    random_seed before each run makes the kNN-MI noise draws identical, so
    ranks and the highly_variable mask must match exactly."""
    rng = np.random.RandomState(3)
    n_cells, n_feat = 120, 20
    cluster = rng.randint(0, 3, size=n_cells)
    X = rng.poisson(
        5.0 + 8.0 * (cluster[:, None] == rng.randint(0, 3, size=n_feat)[None, :])
    ).astype(np.float64)
    var = pd.DataFrame(index=pd.Index([f"ADT{j}" for j in range(n_feat)]))
    obs = pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)]))
    Xin = sp.csr_matrix(X) if sparse else X

    a = ref_pp.Preprocess(random_seed=14).select_features_MI(
        AnnData(Xin.copy(), obs.copy(), var.copy()), cluster,
        n_top_features=7, makeplots=False,
    )
    b = Preprocess(random_seed=14).select_features_MI(
        AnnData(Xin.copy(), obs.copy(), var.copy()), cluster,
        n_top_features=7, makeplots=False,
    )
    pd.testing.assert_series_equal(a.var["MI"], b.var["MI"])
    np.testing.assert_array_equal(
        a.var["MI_Rank"].values, b.var["MI_Rank"].values
    )
    np.testing.assert_array_equal(
        a.var["highly_variable"].values, b.var["highly_variable"].values
    )


def test_preprocess_rna_only_dense_matches_reference(ref_pp):
    """RNA-only dense input through the single-AnnData branch (reference
    preprocess.py:214-219: var_names_make_unique + features_renamed), with
    a duplicated gene name to exercise the dedup."""
    rng = np.random.RandomState(9)
    n_cells, n_genes = 150, 200
    X = rng.poisson(
        rng.gamma(0.8, 1.0, size=(n_cells, 4))
        @ (rng.gamma(0.5, 1.0, size=(4, n_genes))
           * (rng.rand(4, n_genes) < 0.4)) * 3.0
    ).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    genes = [f"G{j}" for j in range(n_genes)]
    genes[5] = genes[4]  # duplicate name → var_names_make_unique must act
    var = pd.DataFrame(index=pd.Index(genes))
    obs = pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)]))
    v = X.var(axis=0)
    hv = np.zeros(n_genes, dtype=bool)
    hv[np.argsort(-v)[:60]] = True

    def make_input():
        ad = AnnData(X.copy(), obs.copy(), var.copy())
        ad.var["highly_variable"] = hv
        return ad

    kwargs = dict(
        harmony_vars=None, n_top_rna_genes=None, makeplots=False,
        quantile_thresh=0.9999,
    )
    rna_a, tp10k_a, hvgs_a = ref_pp.Preprocess(
        random_seed=14
    ).preprocess_for_cnmf(make_input(), **kwargs)
    rna_b, tp10k_b, hvgs_b = Preprocess(random_seed=14).preprocess_for_cnmf(
        make_input(), **kwargs
    )
    assert hvgs_a == hvgs_b
    assert list(rna_a.var.index) == list(rna_b.var.index)
    np.testing.assert_allclose(
        _dense(rna_a.X), _dense(rna_b.X), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        _dense(tp10k_a.X), _dense(tp10k_b.X), rtol=1e-12, atol=1e-12
    )
    # the dedup actually happened and matches
    assert list(tp10k_a.var.index) == list(tp10k_b.var.index)
    assert "G4-1" in list(tp10k_b.var.index)
