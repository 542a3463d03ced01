"""Native (C++/OpenMP) host kernel tests, with fallback coverage."""

import numpy as np
import pytest
import scipy.sparse as sp

from cnmf_tpu import native


@pytest.mark.parametrize("out_dtype", [np.float32, np.float64])
def test_densify_matches_scipy(out_dtype):
    rng = np.random.RandomState(1)
    X = sp.random(500, 300, density=0.15, format="csr",
                  random_state=1, dtype=np.float64)
    out = native.densify_csr(X, out_dtype=out_dtype)
    ref = X.toarray().astype(out_dtype)
    assert out.dtype == np.dtype(out_dtype)
    np.testing.assert_array_equal(out, ref)


def test_densify_handles_empty_rows_and_dense_input():
    X = sp.csr_matrix((10, 6))
    np.testing.assert_array_equal(
        native.densify_csr(X, out_dtype=np.float32), np.zeros((10, 6), np.float32)
    )
    D = np.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(native.densify_csr(D, out_dtype=np.float32),
                                  D.astype(np.float32))


def test_densify_fallback_path(monkeypatch):
    """With the native library unavailable, the scipy fallback is exact."""
    monkeypatch.setattr(native, "_load", lambda: None)
    X = sp.random(50, 40, density=0.2, format="csr", random_state=2,
                  dtype=np.float64)
    out = native.densify_csr(X, out_dtype=np.float32)
    np.testing.assert_array_equal(out, X.toarray().astype(np.float32))


def test_csr_col_moments_matches_numpy():
    import scipy.sparse as sp

    from cnmf_tpu.native import csr_col_moments

    rng = np.random.RandomState(3)
    X = sp.random(300, 200, density=0.1, format="csr", random_state=2,
                  dtype=np.float64)
    out = csr_col_moments(X)
    if out is None:  # no compiler in this environment — fallback covered
        return
    s, q = out
    np.testing.assert_allclose(s, np.asarray(X.sum(axis=0)).ravel(), rtol=1e-12)
    np.testing.assert_allclose(
        q, np.asarray(X.multiply(X).sum(axis=0)).ravel(), rtol=1e-12)
    # f32 data accumulates in f64
    Xf = X.astype(np.float32)
    sf, qf = csr_col_moments(Xf)
    np.testing.assert_allclose(sf, s, rtol=1e-6)
    # CSC / unusual layouts decline
    assert csr_col_moments(X.tocsc()) is None
