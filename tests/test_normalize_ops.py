"""Sparse/dense equivalence of the host normalization kernels (the sparse
paths scale CSR .data in place via scipy's C csr_scale_rows/columns — they
must agree exactly with the dense formulas; reference cnmf.py:250,538,542)."""

import numpy as np
import scipy.sparse as sp

from cnmf_tpu.ops.normalize import normalize_total, scale_unit_variance


def _rand_counts(seed=0, n=80, g=50, density=0.3):
    rng = np.random.RandomState(seed)
    X = rng.poisson(1.2, size=(n, g)) * (rng.rand(n, g) < density)
    X[X.sum(axis=1) == 0, 0] = 1
    return X.astype(np.float64)


def test_normalize_total_sparse_matches_dense():
    X = _rand_counts()
    dense = normalize_total(X, target_sum=1e6)
    sparse = normalize_total(sp.csr_matrix(X), target_sum=1e6)
    assert sp.issparse(sparse)
    np.testing.assert_allclose(sparse.toarray(), dense, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sparse.sum(axis=1)).ravel(), 1e6)


def test_normalize_total_csc_input():
    X = _rand_counts(seed=1)
    out = normalize_total(sp.csc_matrix(X), target_sum=1e4)
    np.testing.assert_allclose(out.toarray(), normalize_total(X, 1e4), rtol=1e-12)


def test_normalize_total_does_not_mutate_input():
    Xs = sp.csr_matrix(_rand_counts(seed=2))
    data_before = Xs.data.copy()
    normalize_total(Xs, target_sum=1e6)
    np.testing.assert_array_equal(Xs.data, data_before)


def test_scale_unit_variance_sparse_matches_dense():
    X = _rand_counts(seed=3)
    dense = scale_unit_variance(X.copy(), ddof=1, zero_safe=True)
    sparse = scale_unit_variance(sp.csr_matrix(X), ddof=1, zero_safe=True)
    np.testing.assert_allclose(sparse.toarray(), dense, rtol=1e-10)
    # columns now have unit variance (ddof=1) where they had any
    v = sparse.toarray().var(axis=0, ddof=1)
    nz = X.var(axis=0) > 0
    np.testing.assert_allclose(v[nz], 1.0, rtol=1e-10)


def test_scale_unit_variance_zero_column():
    X = _rand_counts(seed=4)
    X[:, 7] = 0.0
    out = scale_unit_variance(sp.csr_matrix(X), ddof=1, zero_safe=True)
    assert np.all(out.toarray()[:, 7] == 0.0)


def test_scale_unit_variance_does_not_mutate_input():
    Xs = sp.csr_matrix(_rand_counts(seed=5))
    data_before = Xs.data.copy()
    scale_unit_variance(Xs, ddof=1, zero_safe=True)
    np.testing.assert_array_equal(Xs.data, data_before)
