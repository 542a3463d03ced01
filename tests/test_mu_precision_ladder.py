"""MU precision ladder (ops.nmf.nmf_mu_precision_ladder, VERDICT #3):
coarse cheap-precision sweeps then a parity-precision re-convergence.

On CPU f64 the precision strings change nothing numerically, so phase 1
IS the plain solve and phase 2 adds exactly one 10-sweep check block
(sklearn's every-10 granularity) before its continued stopping rule fires.
Those 10 extra sweeps move KL factors ~1e-3 relative along the objective's
flat directions while the beta-divergence itself only improves — the test
pins (a) objective never worse, (b) sweep accounting = plain + one block,
(c) factor movement bounded by the flat-direction scale. The real
throughput/drift A/B runs on the chip (TODO.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cnmf_tpu.ops.nmf import (
    beta_divergence_error,
    nmf_mu_precision_ladder,
    nmf_multiplicative_update,
)
from cnmf_tpu.ops.init import random_init_batch


def _problem(beta, seed=4, n=60, g=45, k=4, b=6):
    rng = np.random.RandomState(seed)
    X = (np.abs(rng.randn(n, g)) + 0.05).astype(np.float64)
    seeds = rng.randint(1, 2**31 - 1, size=b)
    W0, Ht0 = random_init_batch(X, k, seeds, dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0)


@pytest.mark.parametrize("beta", [1.0, 0.0])
def test_ladder_matches_plain_at_f64(beta):
    X, W0, Ht0 = _problem(beta)
    W_p, Ht_p, n_p = nmf_multiplicative_update(
        X, W0, Ht0, beta=beta, tol=1e-4, max_iter=200
    )
    W_l, Ht_l, n_l = nmf_mu_precision_ladder(
        X, W0, Ht0, beta=beta, tol=1e-4, max_iter=200
    )
    # at least as converged as the plain solve, restart-wise
    err_p = np.asarray(beta_divergence_error(X, W_p, Ht_p, beta))
    err_l = np.asarray(beta_divergence_error(X, W_l, Ht_l, beta))
    assert (err_l <= err_p * (1 + 1e-9)).all()
    # phase 1 == plain at f64; phase 2 = exactly one 10-sweep block per
    # converged restart (the continued rule fires at its first check);
    # max_iter exhaustions enter phase 2 pre-stopped (done0)
    np_p = np.asarray(n_p)
    np.testing.assert_array_equal(
        np.asarray(n_l), np.where(np_p >= 200, np_p, np_p + 10)
    )
    rel = np.sum((np.asarray(Ht_l) - np.asarray(Ht_p)) ** 2) / np.sum(
        np.asarray(Ht_p) ** 2
    )
    assert rel < 1e-2, rel  # flat-direction movement of one block


def test_ladder_engages_via_solver_knob(monkeypatch):
    from cnmf_tpu.pipeline.solvers import solve_nmf_batch

    X, W0, Ht0 = _problem(1.0)
    kwargs = {"solver": "mu", "beta_loss": "kullback-leibler",
              "tol": 1e-4, "max_iter": 120}
    monkeypatch.setenv("CNMF_TPU_MU_PRECISION_LADDER", "0")
    W_off, Ht_off, n_off = solve_nmf_batch(X, W0, Ht0, kwargs)
    monkeypatch.setenv("CNMF_TPU_MU_PRECISION_LADDER", "1")
    W_on, Ht_on, n_on = solve_nmf_batch(X, W0, Ht0, kwargs)
    assert (np.asarray(n_on) >= np.asarray(n_off)).all()
    rel = np.sum((np.asarray(Ht_on) - np.asarray(Ht_off)) ** 2) / np.sum(
        np.asarray(Ht_off) ** 2
    )
    assert rel < 1e-2, rel
