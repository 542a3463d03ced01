"""int64-index CSR support.

scipy promotes CSR indices AND indptr to int64 once nnz >= 2^31 (the
>2.1B-nnz atlas regime). A true matrix of that size doesn't fit a test
host, so these tests force the INDEX DTYPE on small matrices — the code
paths branch on dtype, not on magnitude — and pin native-vs-numpy and
int64-vs-int32 equivalence through the kernels, the loaders, and the full
prepare → factorize → consensus pipeline (sparse-products path included).
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cnmf_tpu.native import csr_col_moments, csr_col_subset, densify_csr


def _as_i64(X: sp.csr_matrix) -> sp.csr_matrix:
    # the constructor canonicalizes small indices back to int32 — assign the
    # attribute arrays directly, as scipy itself leaves them at nnz >= 2^31
    out = X.copy()
    out.indices = out.indices.astype(np.int64)
    out.indptr = out.indptr.astype(np.int64)
    assert out.indices.dtype == np.int64 and out.indptr.dtype == np.int64
    return out


def _rand_csr(n, g, density=0.3, dtype=np.float64, seed=0):
    rng = np.random.RandomState(seed)
    return sp.random(
        n, g, density=density, format="csr", dtype=dtype, random_state=rng
    )


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_densify_int64_matches_int32(dtype):
    X = _rand_csr(40, 30, dtype=dtype, seed=1)
    ref = densify_csr(X, out_dtype=np.float32)
    out = densify_csr(_as_i64(X), out_dtype=np.float32)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out, X.toarray().astype(np.float32))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_col_moments_int64(dtype):
    X = _rand_csr(50, 25, dtype=dtype, seed=2)
    res = csr_col_moments(_as_i64(X))
    if res is None:
        pytest.skip("native library unavailable")
    s, q = res
    d = X.toarray().astype(np.float64)
    np.testing.assert_allclose(s, d.sum(0), rtol=1e-12)
    np.testing.assert_allclose(q, (d ** 2).sum(0), rtol=1e-12)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_col_subset_int64(dtype):
    X = _rand_csr(30, 40, dtype=dtype, seed=3)
    cols = np.array([5, 1, 17, 33, 8])
    lookup = np.full(40, -1, dtype=np.int32)
    lookup[cols] = np.arange(len(cols), dtype=np.int32)
    res = csr_col_subset(_as_i64(X), lookup)
    if res is None:
        pytest.skip("native library unavailable")
    data, indices, indptr = res
    # output keeps the INPUT index dtype — uniform scipy arrays, no recast
    assert indices.dtype == np.int64
    out = sp.csr_matrix((data, indices, indptr), shape=(30, len(cols)))
    out.sort_indices()
    np.testing.assert_array_equal(
        out.toarray(), X[:, cols].toarray()
    )


def test_csr_column_subset_int64_end_to_end():
    from cnmf_tpu.io.anndata_lite import csr_column_subset

    X = _rand_csr(25, 60, seed=4)
    cols = np.sort(np.random.RandomState(5).choice(60, 20, replace=False))
    a = csr_column_subset(X, cols)
    b = csr_column_subset(_as_i64(X), cols)
    np.testing.assert_array_equal(a.toarray(), b.toarray())
    np.testing.assert_array_equal(a.toarray(), X[:, cols].toarray())


@pytest.mark.parametrize("branch", ["device", "sparse_products"])
def test_pipeline_int64_sparse_counts(tmp_path, branch):
    """prepare → factorize → consensus on h5ad counts stored with int64 CSR
    indices must reproduce the int32 run bit-for-branch: both the device
    consensus path and the forced sparse-products (host SpMM + device CD)
    atlas branch."""
    from cnmf_tpu import cNMF
    from cnmf_tpu.io.anndata_lite import AnnData
    from cnmf_tpu.io.dataframe import load_df_from_npz
    from cnmf_tpu.io.h5ad import write_h5ad

    rng = np.random.RandomState(42)
    W = rng.gamma(0.7, 1.0, size=(90, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 130)) * (rng.rand(4, 130) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1

    results = {}
    for tag, cast in [("i32", lambda m: m), ("i64", _as_i64)]:
        ad = AnnData(
            X=cast(sp.csr_matrix(X)),
            obs=pd.DataFrame(index=[f"c{i}" for i in range(90)]),
            var=pd.DataFrame(index=[f"g{j}" for j in range(130)]),
        )
        fn = str(tmp_path / f"counts_{branch}_{tag}.h5ad")
        write_h5ad(fn, ad)
        obj = cNMF(output_dir=str(tmp_path), name=f"run_{branch}_{tag}")
        obj.prepare(counts_fn=fn, components=[4], n_iter=4, seed=14,
                    num_highvar_genes=70)
        obj.factorize(verbose=False)
        obj.combine()
        if branch == "sparse_products":
            obj.tpm_device_bytes_limit = 1
        obj.consensus(k=4, density_threshold=0.5, show_clustering=False)
        results[tag] = {
            key: load_df_from_npz(obj.paths[key] % (4, "0_5"))
            for key in ["consensus_spectra", "consensus_usages",
                        "gene_spectra_tpm", "gene_spectra_score"]
        }
    for key in results["i32"]:
        a, b = results["i32"][key], results["i64"][key]
        sse = float(((a.values - b.values) ** 2).sum())
        assert sse < 1e-6, (key, sse)
