"""Device-side CSR densification: exact equality with the host expansion."""

import numpy as np
import pytest
import scipy.sparse as sp

from cnmf_tpu.ops.device_densify import (
    device_densify_csr,
    device_densify_eligible,
)


def _random_csr(n, g, density, seed, dtype=np.float64):
    rng = np.random.RandomState(seed)
    X = sp.random(n, g, density=density, random_state=rng, format="csr")
    X.data = (rng.gamma(1.0, 2.0, size=X.nnz) + 0.5).astype(dtype)
    return X


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("density", [0.0, 0.03, 0.4])
def test_matches_host_densify(dtype, density):
    X = _random_csr(257, 129, density, seed=3)
    dense = np.asarray(device_densify_csr(X, out_dtype=dtype))
    expect = X.toarray().astype(dtype)
    assert dense.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(dense, expect)


def test_csc_and_noncanonical_inputs():
    X = _random_csr(64, 40, 0.1, seed=5)
    np.testing.assert_array_equal(
        np.asarray(device_densify_csr(X.tocsc(), out_dtype=np.float32)),
        X.toarray().astype(np.float32),
    )
    # duplicate coordinates: scipy sums them on densify; so must the scatter
    dup = sp.csr_matrix(
        (
            np.array([1.0, 2.0, 4.0, 8.0]),
            np.array([3, 3, 0, 1]),
            np.array([0, 2, 4, 4]),
        ),
        shape=(3, 5),
    )
    assert not dup.has_canonical_format
    np.testing.assert_array_equal(
        np.asarray(device_densify_csr(dup, out_dtype=np.float64)),
        dup.toarray(),
    )


def test_empty_rows_and_zero_nnz():
    X = sp.csr_matrix((5, 7))
    np.testing.assert_array_equal(
        np.asarray(device_densify_csr(X, out_dtype=np.float32)),
        np.zeros((5, 7), np.float32),
    )


def test_eligibility_gate(monkeypatch):
    monkeypatch.setenv("CNMF_TPU_DEVICE_DENSIFY", "1")
    sparse_enough = _random_csr(100, 100, 0.05, seed=1)
    too_dense = _random_csr(100, 100, 0.5, seed=2)
    # dense ndarray and multi-device meshes never take the scatter path
    assert not device_densify_eligible(np.ones((4, 4)), np.float32)
    assert not device_densify_eligible(sparse_enough, np.float32, n_devices=8)
    # the CPU test backend is excluded (host densify is free there) — flip
    # the backend check off by monkeypatching for the byte-math assertions
    import cnmf_tpu.ops.device_densify as dd

    monkeypatch.setattr(
        dd.jax, "default_backend", lambda: "tpu", raising=True
    )
    assert device_densify_eligible(sparse_enough, np.float32)
    assert not device_densify_eligible(too_dense, np.float32)
    monkeypatch.setenv("CNMF_TPU_DEVICE_DENSIFY", "0")
    assert not device_densify_eligible(sparse_enough, np.float32)


def test_blocked_scatter_matches_single_shot(monkeypatch):
    import cnmf_tpu.ops.device_densify as dd

    X = _random_csr(300, 200, 0.2, seed=7)  # nnz ~12000
    expect = X.toarray().astype(np.float32)
    monkeypatch.setattr(dd, "_SINGLE_SHOT_MAX_NNZ", 1000)
    monkeypatch.setattr(dd, "_BLOCK_NNZ", 1 << 10)  # many blocks, unaligned
    got = np.asarray(dd.device_densify_csr(X, out_dtype=np.float32))
    np.testing.assert_array_equal(got, expect)
