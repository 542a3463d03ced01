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
