"""Pallas fused MU kernel tests (interpret mode on CPU; the compiled TPU
variants were validated on hardware — see ops/pallas_mu.py)."""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

import cnmf_tpu.ops.pallas_mu as pm
from cnmf_tpu.ops.init import random_init
from cnmf_tpu.ops.nmf import nmf_multiplicative_update

EPS = np.finfo(np.float32).eps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    for name in ["kl_mu_w_numerator", "kl_mu_h_numerator", "kl_x_log_wh",
                 "beta_mu_w_terms", "beta_mu_h_terms"]:
        monkeypatch.setattr(
            pm, name, functools.partial(getattr(pm, name), interpret=True)
        )


def make_problem(B=3, N=100, G=96, K=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.gamma(1, 1, (N, G)).astype(np.float32)
    W = np.abs(rng.randn(B, N, K)).astype(np.float32)
    Ht = np.abs(rng.randn(B, G, K)).astype(np.float32)
    return X, W, Ht


def test_kl_numerators_match_reference():
    X, W, Ht = make_problem()
    num_w = np.asarray(pm.kl_mu_w_numerator(jnp.asarray(X), jnp.asarray(W), jnp.asarray(Ht)))
    num_h = np.asarray(pm.kl_mu_h_numerator(jnp.asarray(X), jnp.asarray(W), jnp.asarray(Ht)))
    e = np.asarray(pm.kl_x_log_wh(jnp.asarray(X), jnp.asarray(W), jnp.asarray(Ht)))
    for b in range(W.shape[0]):
        WH = np.maximum(W[b] @ Ht[b].T, EPS)
        ratio = X / WH
        np.testing.assert_allclose(num_w[b], ratio @ Ht[b], rtol=2e-5)
        np.testing.assert_allclose(num_h[b], (W[b].T @ ratio).T, rtol=2e-5)
        ref_e = np.where(X > EPS, X * np.log(WH), 0).sum()
        assert abs(float(e[b]) - ref_e) / abs(ref_e) < 1e-4


@pytest.mark.parametrize("beta", [0.0, 1.5])
def test_beta_terms_match_reference(beta):
    X, W, Ht = make_problem(seed=1)
    num_w, den_w = pm.beta_mu_w_terms(jnp.asarray(X), jnp.asarray(W), jnp.asarray(Ht), beta)
    num_h, den_h = pm.beta_mu_h_terms(jnp.asarray(X), jnp.asarray(W), jnp.asarray(Ht), beta)
    for b in range(W.shape[0]):
        WH = W[b] @ Ht[b].T
        WH_num = np.maximum(WH, EPS) if beta - 2 < 0 else WH
        ratio = X * WH_num ** (beta - 2)
        WH_den = np.maximum(WH, EPS) if beta - 1 < 0 else WH
        g = WH_den ** (beta - 1)
        np.testing.assert_allclose(np.asarray(num_w)[b], ratio @ Ht[b], rtol=3e-5)
        np.testing.assert_allclose(np.asarray(den_w)[b], g @ Ht[b], rtol=3e-5)
        np.testing.assert_allclose(np.asarray(num_h)[b], (W[b].T @ ratio).T, rtol=3e-5)
        np.testing.assert_allclose(np.asarray(den_h)[b], (W[b].T @ g).T, rtol=3e-5)


def test_cd_half_sweeps_match_xla():
    """Fused CD half-sweep kernels == the XLA _cd_half_sweep on one sweep,
    including multi-tile row/column padding and K-bucket zero columns."""
    import cnmf_tpu.ops.pallas_cd as pc
    from cnmf_tpu.ops.nmf import _cd_half_sweep, _shared_x_dot, _shared_xt_dot

    B, N, G, K = 3, 1100, 300, 8
    rng = np.random.RandomState(4)
    X = rng.gamma(1, 1, (N, G)).astype(np.float32)
    W = np.abs(rng.randn(B, N, K)).astype(np.float32)
    Ht = np.abs(rng.randn(B, G, K)).astype(np.float32)
    W[:, :, -2:] = 0.0  # K-bucket padding columns
    Ht[:, :, -2:] = 0.0

    tile_n, tile_g, Np, Gp = pc.plan_tiles(N, G)
    assert Np > N and Gp > G  # exercises the padding
    Xp = jnp.asarray(np.pad(X, ((0, Np - N), (0, Gp - G))))
    Wp = jnp.asarray(np.pad(W, ((0, 0), (0, Np - N), (0, 0))))
    Htp = jnp.asarray(np.pad(Ht, ((0, 0), (0, Gp - G), (0, 0))))

    W_pl, viol_w_pl = pc.cd_w_half_sweep(
        Xp, Wp, Htp, tile_n=tile_n, l1_reg=0.1, l2_reg=0.2, interpret=True
    )
    HHt = jnp.einsum("bgk,bgl->bkl", jnp.asarray(Ht), jnp.asarray(Ht))
    XHt = _shared_x_dot(jnp.asarray(X), jnp.asarray(Ht))
    W_x, viol_w_x = _cd_half_sweep(jnp.asarray(W), HHt, XHt, 0.1, 0.2)
    np.testing.assert_allclose(np.asarray(W_pl[:, :N]), np.asarray(W_x),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(viol_w_pl), np.asarray(viol_w_x),
                               rtol=2e-5)
    assert not np.asarray(W_pl[:, N:]).any()  # pad rows stay zero

    Ht_pl, viol_h_pl = pc.cd_h_half_sweep(
        Xp, Wp, Htp, tile_g=tile_g, interpret=True
    )
    WtW = jnp.einsum("bnk,bnl->bkl", jnp.asarray(W), jnp.asarray(W))
    XtW = _shared_xt_dot(jnp.asarray(X), jnp.asarray(W))
    Ht_x, viol_h_x = _cd_half_sweep(jnp.asarray(Ht), WtW, XtW, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(Ht_pl[:, :G]), np.asarray(Ht_x),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(viol_h_pl), np.asarray(viol_h_x),
                               rtol=2e-5)


@pytest.mark.parametrize("update_H", [True, False])
def test_cd_solver_pallas_matches_xla(update_H):
    """Full CD solve through the fused kernels (interpret mode) matches the
    XLA solver — same sweep counts, same factors — for both free-H
    factorization and the fixed-spectra NNLS refit path."""
    from cnmf_tpu.ops.nmf import nmf_coordinate_descent

    rng = np.random.RandomState(5)
    Wt = rng.gamma(2., 1., (80, 5))
    Hf = rng.gamma(2., 1., (5, 60))
    X = (rng.poisson(Wt @ Hf) + 0.2).astype(np.float32)
    if update_H:
        W0, H0 = random_init(X, 5, 7, dtype=np.float32)
        W0, Ht0 = W0[None], H0.T[None]
    else:
        W0 = np.zeros((1, 80, 5), np.float32)
        Ht0 = np.abs(rng.randn(1, 60, 5)).astype(np.float32)
    args = (jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0))
    Wp, Htp, n_p = nmf_coordinate_descent(
        *args, tol=1e-4, max_iter=80, update_H=update_H,
        use_pallas=True, interpret=True)
    Wx, Htx, n_x = nmf_coordinate_descent(
        *args, tol=1e-4, max_iter=80, update_H=update_H)
    assert int(n_p[0]) == int(n_x[0])
    np.testing.assert_allclose(np.asarray(Wp), np.asarray(Wx),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Htp), np.asarray(Htx),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("beta", [0.0, 1.0])
def test_mu_solver_pallas_matches_xla(beta):
    rng = np.random.RandomState(2)
    Wt = rng.gamma(2., 1., (60, 4))
    Hf = rng.gamma(2., 1., (4, 40))
    X = (rng.poisson(Wt @ Hf) + 0.5).astype(np.float32)
    W0, H0 = random_init(X, 4, 5, dtype=np.float32)
    args = (jnp.asarray(X), jnp.asarray(W0[None]), jnp.asarray(H0.T[None]))
    Wp, Htp, n_p = nmf_multiplicative_update(
        *args, beta=beta, tol=1e-4, max_iter=60, chunk=1, use_pallas=True)
    Wx, Htx, n_x = nmf_multiplicative_update(
        *args, beta=beta, tol=1e-4, max_iter=60, chunk=1, use_pallas=False)
    assert int(n_p[0]) == int(n_x[0])
    assert float(jnp.max(jnp.abs(Htp - Htx)) / jnp.max(Htx)) < 1e-5
    assert float(jnp.max(jnp.abs(Wp - Wx)) / jnp.max(Wx)) < 1e-5
