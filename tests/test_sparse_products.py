"""Sparse-products refits and OLS: the atlas-scale consensus path where the
full-gene TPM never goes dense (host SpMM for the X·Hᵀ products, device loop
on the small factor only) must agree with the dense device path."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cnmf_tpu import cNMF, write_h5ad
from cnmf_tpu.io.anndata_lite import AnnData
from cnmf_tpu.io.dataframe import load_df_from_npz
from cnmf_tpu.ops.ols import efficient_ols_all_cols
from cnmf_tpu.pipeline.solvers import refit_spectra_transposed, refit_usages

KW = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4, "max_iter": 300,
      "alpha_W": 0.0, "l1_ratio": 0.0}


def _problem(seed, n=150, g=90, k=4, density=0.25):
    rng = np.random.RandomState(seed)
    X = sp.random(n, g, density=density, random_state=rng, format="csr")
    X.data = rng.gamma(1.0, 2.0, size=X.nnz) + 0.1
    spectra = np.abs(rng.standard_normal((k, g)))
    usages = np.abs(rng.standard_normal((n, k)))
    return X, spectra, usages


def test_refit_usages_sparse_matches_dense():
    X, spectra, _ = _problem(0)
    dense = refit_usages(X.toarray(), spectra, KW, dtype=np.float64)
    sparse = refit_usages(X, spectra, KW, dtype=np.float64)
    np.testing.assert_allclose(sparse, dense, rtol=1e-8, atol=1e-10)


def test_refit_usages_sparse_mu_falls_back():
    X, spectra, _ = _problem(1)
    kw = dict(KW, solver="mu", beta_loss="kullback-leibler", max_iter=60)
    dense = refit_usages(X.toarray(), spectra, kw, dtype=np.float64)
    sparse = refit_usages(X, spectra, kw, dtype=np.float64)
    np.testing.assert_allclose(sparse, dense, rtol=1e-8, atol=1e-10)


def test_refit_spectra_transposed_sparse_matches_dense():
    X, _, usages = _problem(2)
    dense = refit_spectra_transposed(X.toarray(), usages, KW, dtype=np.float64)
    sparse = refit_spectra_transposed(X, usages, KW, dtype=np.float64)
    np.testing.assert_allclose(sparse, dense, rtol=1e-8, atol=1e-10)
    # and both equal the literal transpose trick through refit_usages
    literal = refit_usages(
        np.ascontiguousarray(X.toarray().T),
        np.ascontiguousarray(usages.T), KW, dtype=np.float64,
    )
    np.testing.assert_allclose(dense, literal, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("normalize_y", [False, True])
def test_ols_sparse_spmm_matches_dense(normalize_y):
    rng = np.random.RandomState(3)
    Y = sp.random(200, 120, density=0.3, random_state=rng, format="csr")
    Y.data = rng.gamma(1.0, 3.0, size=Y.nnz) + 0.5
    U = np.abs(rng.standard_normal((200, 5)))
    dense = efficient_ols_all_cols(
        U, np.asarray(Y.toarray()), normalize_y=normalize_y, dtype=np.float64,
        batch_size=64,
    )
    sparse = efficient_ols_all_cols(
        U, Y, normalize_y=normalize_y, dtype=np.float64
    )
    np.testing.assert_allclose(sparse, dense, rtol=1e-7, atol=1e-9)


def test_ols_sparse_multiblock_matches_single(monkeypatch):
    """Force several accumulation blocks (incl. an f32 input that must
    upcast per block) and compare to the one-block result."""
    import cnmf_tpu.ops.ols as ols_mod

    rng = np.random.RandomState(11)
    Y = sp.random(300, 80, density=0.25, random_state=rng, format="csr")
    Y.data = (rng.gamma(1.0, 2.0, size=Y.nnz) + 0.5)
    Y32 = Y.astype(np.float32)
    U = np.abs(rng.standard_normal((300, 6)))
    ref = efficient_ols_all_cols(U, Y, normalize_y=True, dtype=np.float64)
    monkeypatch.setattr(ols_mod, "SPMM_BLOCK_NNZ", 500)  # ~12 blocks
    got = efficient_ols_all_cols(U, Y, normalize_y=True, dtype=np.float64)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
    got32 = efficient_ols_all_cols(U, Y32, normalize_y=True, dtype=np.float64)
    np.testing.assert_allclose(got32, ref, rtol=2e-5, atol=1e-7)


def test_consensus_sparse_atlas_kl_falls_back_to_gene_chunks(tmp_path):
    """KL (MU) consensus on a sparse over-limit TPM cannot ride the CD
    product path — it must take the gene-chunked refit and reproduce the
    device-resident artifacts."""
    rng = np.random.RandomState(13)
    W = rng.gamma(0.7, 1.0, size=(80, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 120)) * (rng.rand(4, 120) < 0.35)
    X = sp.csr_matrix(rng.poisson(W @ H * 2.0).astype(np.float64))
    empty = np.asarray(X.sum(axis=1)).ravel() == 0
    if empty.any():
        X = X.tolil(); X[np.flatnonzero(empty), 0] = 1; X = X.tocsr()
    fn = str(tmp_path / "ckl.h5ad")
    write_h5ad(fn, AnnData(
        X, obs=pd.DataFrame(index=[f"c{i}" for i in range(80)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(120)]),
    ))
    obj = cNMF(output_dir=str(tmp_path), name="skl")
    obj.prepare(counts_fn=fn, components=[4], n_iter=4, seed=3,
                num_highvar_genes=80, beta_loss="kullback-leibler",
                max_NMF_iter=120)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
    dev_tpm = load_df_from_npz(obj.paths["gene_spectra_tpm"] % (4, "2_0"))
    dev_usage = load_df_from_npz(obj.paths["consensus_usages"] % (4, "2_0"))
    obj.tpm_device_bytes_limit = 1  # force the over-limit branch
    try:
        obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
    finally:
        del obj.tpm_device_bytes_limit
    for key, ref in [("gene_spectra_tpm", dev_tpm),
                     ("consensus_usages", dev_usage)]:
        got = load_df_from_npz(obj.paths[key] % (4, "2_0"))
        scale = max(float((ref.values ** 2).sum()), 1e-12)
        sse = float(((got.values - ref.values) ** 2).sum()) / scale
        assert sse < 1e-5, (key, sse)


def test_consensus_sparse_atlas_path_matches_device(tmp_path):
    """Force the >limit-TPM branch with a SPARSE input: the spectra refit,
    OLS and final refit must ride the SpMM product paths and reproduce the
    device-resident artifacts."""
    rng = np.random.RandomState(9)
    W = rng.gamma(0.7, 1.0, size=(160, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 240)) * (rng.rand(5, 240) < 0.3)
    X = sp.csr_matrix(rng.poisson(W @ H * 2.0).astype(np.float64))
    empty = np.asarray(X.sum(axis=1)).ravel() == 0
    if empty.any():
        X = X.tolil(); X[np.flatnonzero(empty), 0] = 1; X = X.tocsr()
    fn = str(tmp_path / "c.h5ad")
    write_h5ad(fn, AnnData(
        X, obs=pd.DataFrame(index=[f"c{i}" for i in range(160)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(240)]),
    ))
    obj = cNMF(output_dir=str(tmp_path), name="sa")
    obj.prepare(counts_fn=fn, components=[5], n_iter=6, seed=7,
                num_highvar_genes=150)
    obj.factorize(verbose=False)
    obj.combine()

    obj.consensus(k=5, density_threshold=2.0, show_clustering=False)
    dev_tpm = load_df_from_npz(obj.paths["gene_spectra_tpm"] % (5, "2_0"))
    dev_score = load_df_from_npz(obj.paths["gene_spectra_score"] % (5, "2_0"))
    dev_usage = load_df_from_npz(obj.paths["consensus_usages"] % (5, "2_0"))

    obj.tpm_device_bytes_limit = 1  # force the sparse atlas branch
    try:
        obj.consensus(k=5, density_threshold=2.0, show_clustering=False)
    finally:
        del obj.tpm_device_bytes_limit
    for path_key, ref in [("gene_spectra_tpm", dev_tpm),
                          ("gene_spectra_score", dev_score),
                          ("consensus_usages", dev_usage)]:
        got = load_df_from_npz(obj.paths[path_key] % (5, "2_0"))
        scale = max(float((ref.values ** 2).sum()), 1e-12)
        sse = float(((got.values - ref.values) ** 2).sum()) / scale
        assert sse < 1e-6, (path_key, sse)


def test_products_mesh_sharding_matches_single_device(monkeypatch):
    """Round-5 VERDICT #7: the over-limit distilled-products solve
    row-shards over the whole device grid (solvers.shard_products_rows);
    f64 results must match the unsharded solve to psum reduction order."""
    from cnmf_tpu.pipeline.solvers import (
        refit_spectra_transposed,
        refit_usages,
    )

    rng = np.random.RandomState(21)
    n, g, k = 131, 95, 5  # odd sizes: uneven shards exercise the zero-pad
    X = sp.random(n, g, density=0.3, format="csr", random_state=rng,
                  dtype=np.float64)
    spectra = np.abs(rng.standard_normal((k, g)))
    usages = np.abs(rng.standard_normal((n, k)))
    kwargs = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4,
              "max_iter": 60}

    monkeypatch.setenv("CNMF_TPU_MESH_PRODUCTS", "1")
    ru_mesh = refit_usages(X, spectra, kwargs, dtype=np.float64)
    rs_mesh = refit_spectra_transposed(X, usages, kwargs, dtype=np.float64,
                                       n_cells=n)
    monkeypatch.setenv("CNMF_TPU_MESH_PRODUCTS", "0")
    ru_one = refit_usages(X, spectra, kwargs, dtype=np.float64)
    rs_one = refit_spectra_transposed(X, usages, kwargs, dtype=np.float64,
                                      n_cells=n)
    np.testing.assert_allclose(ru_mesh, ru_one, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(rs_mesh, rs_one, rtol=1e-9, atol=1e-12)
