"""csr_column_subset: the one-pass CSR column gather must match scipy's
CSC-routed slicing exactly (it replaces ``X.tocsc()[:, cols].tocsr()`` on the
atlas consensus path, where the double conversion measured 22-31 s)."""

import numpy as np
import pytest
import scipy.sparse as sp

from cnmf_tpu.io.anndata_lite import AnnData, csr_column_subset


def _rand_csr(seed, n=60, g=40, density=0.2):
    rng = np.random.RandomState(seed)
    X = sp.random(n, g, density=density, random_state=rng, format="csr")
    X.data = rng.gamma(1.0, 2.0, size=X.nnz)
    return X


@pytest.mark.parametrize("seed", [0, 1])
def test_subset_matches_scipy_ordered(seed):
    X = _rand_csr(seed)
    cols = np.sort(np.random.RandomState(seed + 10).choice(40, 17, replace=False))
    ref = X.tocsc()[:, cols].tocsr()
    got = csr_column_subset(X, cols)
    assert got.shape == ref.shape
    assert (got != ref).nnz == 0
    assert got.has_sorted_indices


def test_subset_matches_scipy_unordered():
    X = _rand_csr(3)
    cols = np.random.RandomState(4).permutation(40)[:15]
    ref = X.tocsc()[:, cols].tocsr()
    got = csr_column_subset(X, cols)
    assert (got != ref).nnz == 0


def test_trailing_empty_rows_numpy_fallback(monkeypatch):
    """Regression: the reduceat fallback must not steal the last stored
    element of the final nonempty row when trailing rows are empty."""
    import cnmf_tpu.native as native

    monkeypatch.setattr(native, "csr_col_subset", lambda *a: None)
    X = sp.csr_matrix(np.array([[1.0, 2.0, 3.0], [0, 0, 0]]))
    got = csr_column_subset(X, np.array([0, 2]))
    np.testing.assert_array_equal(got.toarray(), [[1.0, 3.0], [0.0, 0.0]])
    # interleaved empty rows too
    X2 = sp.csr_matrix(np.array([[0, 0, 0], [4.0, 0, 5.0], [0, 0, 0],
                                 [0, 6.0, 7.0], [0, 0, 0]]))
    got2 = csr_column_subset(X2, np.array([2, 1]))
    np.testing.assert_array_equal(
        got2.toarray(), [[0, 0], [5.0, 0], [0, 0], [7.0, 6.0], [0, 0]]
    )


def test_anndata_negative_int_indices_fall_back():
    """Regression: negative positions alias through the gather table — they
    must take the scipy route and still produce the right columns."""
    import pandas as pd

    X = _rand_csr(8, n=12, g=4, density=0.6)
    ad = AnnData(X, var=pd.DataFrame(index=[f"g{j}" for j in range(4)]))
    sub = ad[:, np.array([-1, 3])]
    ref = X.tocsc()[:, [3, 3]].tocsr()
    assert (sub.X != ref).nnz == 0


def test_subset_empty_rows_and_all_columns_dropped():
    X = sp.csr_matrix(np.array([[0, 1, 0], [0, 0, 0], [2, 0, 3]], dtype=float))
    got = csr_column_subset(X, np.array([1]))
    np.testing.assert_array_equal(got.toarray(), [[1.0], [0.0], [0.0]])
    got2 = csr_column_subset(X, np.array([], dtype=int))
    assert got2.shape == (3, 0) and got2.nnz == 0


def test_anndata_label_slice_uses_fast_path():
    import pandas as pd

    X = _rand_csr(5, n=30, g=20)
    genes = [f"g{j}" for j in range(20)]
    ad = AnnData(X, var=pd.DataFrame(index=genes))
    pick = ["g3", "g17", "g0", "g9"]
    sub = ad[:, pick]
    ref = X.tocsc()[:, [3, 17, 0, 9]].tocsr()
    assert (sub.X != ref).nnz == 0
    assert list(sub.var.index) == pick


def test_numpy_fallback_matches_native(monkeypatch):
    import cnmf_tpu.native as native

    X = _rand_csr(7, n=50, g=30, density=0.3)
    cols = np.array([4, 0, 29, 11, 12])
    ref = csr_column_subset(X, cols)  # native (when compiler present)
    monkeypatch.setattr(native, "csr_col_subset", lambda *a: None)
    got = csr_column_subset(X, cols)  # forced numpy path
    assert (got != ref).nnz == 0


def test_anndata_duplicate_labels_fall_back():
    import pandas as pd

    X = _rand_csr(6, n=10, g=8)
    ad = AnnData(X, var=pd.DataFrame(index=[f"g{j}" for j in range(8)]))
    sub = ad[:, ["g2", "g2", "g5"]]
    ref = X.tocsc()[:, [2, 2, 5]].tocsr()
    assert (sub.X != ref).nnz == 0
