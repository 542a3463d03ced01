"""Gram-route PCA must match a full numpy SVD oracle (svd_flip signs) in
both shapes (N >= G feature-gram and N < G row-gram)."""

import numpy as np
import pytest

from cnmf_tpu.ops.pca import pca


def _oracle(X, n_comps):
    Xc = X - X.mean(axis=0)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    max_idx = np.argmax(np.abs(U), axis=0)
    signs = np.sign(U[max_idx, np.arange(U.shape[1])])
    U = U * signs[None, :]
    Vt = Vt * signs[:, None]
    return U[:, :n_comps] * S[None, :n_comps], Vt[:n_comps], \
        (S ** 2)[:n_comps] / (X.shape[0] - 1)


@pytest.mark.parametrize("shape", [(300, 80), (60, 200)])
def test_pca_matches_svd_oracle(shape):
    rng = np.random.RandomState(0)
    # well-separated spectrum so the subspace comparison is stable
    base = rng.standard_normal((shape[0], 12)) * np.linspace(10, 2, 12)
    X = (base @ rng.standard_normal((12, shape[1]))
         + 0.01 * rng.standard_normal(shape)).astype(np.float64)
    pcs, comps, ev = pca(X, n_comps=8)
    ref_pcs, ref_comps, ref_ev = _oracle(X, 8)
    np.testing.assert_allclose(ev, ref_ev, rtol=1e-3)
    # compare up to the shared convention — signs are pinned by svd_flip so
    # direct comparison applies
    np.testing.assert_allclose(pcs, ref_pcs, rtol=5e-3, atol=5e-3 * np.abs(ref_pcs).max())
    np.testing.assert_allclose(comps, ref_comps, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("shape", [(50, 20), (20, 50)])
def test_pca_rank_deficient_keeps_unit_components(shape):
    # both Gram branches must share the null-direction convention:
    # unit-norm component rows even past the input rank
    rng = np.random.RandomState(2)
    base = rng.standard_normal((shape[0], 3))
    X = base @ rng.standard_normal((3, shape[1]))  # rank 3
    pcs, comps, ev = pca(X, n_comps=6)
    norms = np.linalg.norm(comps, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # null directions carry (numerically) no variance
    assert ev[3:].max() < 1e-6 * ev[0]


def test_pca_reconstruction_quality():
    rng = np.random.RandomState(1)
    X = (rng.standard_normal((150, 40)) @ np.diag(np.linspace(5, 0.1, 40))).astype(np.float64)
    pcs, comps, _ = pca(X, n_comps=40 - 1)
    Xc = X - X.mean(axis=0)
    rec = pcs @ comps
    rel = np.linalg.norm(rec - Xc) / np.linalg.norm(Xc)
    assert rel < 1e-2
