"""Per-kernel parity tests: batched JAX NMF solvers vs sklearn (float64, CPU).

The reference delegates all NMF solves to sklearn (reference cnmf.py:672), so
sklearn is the numerical oracle: with identical inits our CD/MU solvers must
reproduce its factors and iteration counts.
"""

import numpy as np
import pytest
from sklearn.decomposition import non_negative_factorization

import jax.numpy as jnp

from cnmf_tpu.ops.init import nndsvd_init, random_init, random_init_batch
from cnmf_tpu.ops.nmf import (
    nmf_coordinate_descent,
    nmf_multiplicative_update,
    nnls_coordinate_descent,
    nnls_multiplicative_update,
)


def make_counts(n=60, g=40, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.gamma(2.0, 1.0, size=(n, 4))
    H = rng.gamma(2.0, 1.0, size=(4, g))
    X = rng.poisson(W @ H).astype(np.float64) + 1e-8
    return X


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("k", [4, 7])
def test_cd_matches_sklearn(seed, k):
    X = make_counts()
    W_sk, H_sk, n_sk = non_negative_factorization(
        X, n_components=k, init="random", random_state=seed,
        solver="cd", beta_loss="frobenius", tol=1e-4, max_iter=500,
    )

    W0, H0 = random_init(X, k, seed, dtype=np.float64)
    W, Ht, n_iter = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0[None]), jnp.asarray(H0.T[None]),
        tol=1e-4, max_iter=500,
    )
    W, H = np.asarray(W[0]), np.asarray(Ht[0]).T

    assert int(n_iter[0]) == n_sk
    scale = max(H_sk.max(), 1.0)
    assert np.max(np.abs(H - H_sk)) / scale < 1e-6
    assert np.max(np.abs(W - W_sk)) / max(W_sk.max(), 1.0) < 1e-6


def test_cd_batched_matches_serial():
    X = make_counts(50, 30, seed=1)
    k = 5
    seeds = [11, 12, 13]
    W0, Ht0 = random_init_batch(X, k, seeds, dtype=np.float64)
    Wb, Htb, n_b = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-4, max_iter=300
    )
    for i, seed in enumerate(seeds):
        W_sk, H_sk, n_sk = non_negative_factorization(
            X, n_components=k, init="random", random_state=seed,
            solver="cd", beta_loss="frobenius", tol=1e-4, max_iter=300,
        )
        assert int(n_b[i]) == n_sk
        assert np.max(np.abs(np.asarray(Htb[i]).T - H_sk)) / max(H_sk.max(), 1.0) < 1e-6


@pytest.mark.parametrize("beta_name,beta", [
    ("frobenius", 2.0), ("kullback-leibler", 1.0), ("itakura-saito", 0.0),
])
def test_mu_matches_sklearn(beta_name, beta):
    X = make_counts(40, 25, seed=2)
    if beta == 0.0:
        X = X + 0.5  # IS loss forbids zeros
    k = 4
    seed = 5
    W_sk, H_sk, n_sk = non_negative_factorization(
        X, n_components=k, init="random", random_state=seed,
        solver="mu", beta_loss=beta_name, tol=1e-4, max_iter=200,
    )
    W0, H0 = random_init(X, k, seed, dtype=np.float64)
    W, Ht, n_iter = nmf_multiplicative_update(
        jnp.asarray(X), jnp.asarray(W0[None]), jnp.asarray(H0.T[None]),
        beta=beta, tol=1e-4, max_iter=200, chunk=2,
    )
    W, H = np.asarray(W[0]), np.asarray(Ht[0]).T
    assert int(n_iter[0]) == n_sk
    assert np.max(np.abs(H - H_sk)) / max(H_sk.max(), 1.0) < 1e-5
    assert np.max(np.abs(W - W_sk)) / max(W_sk.max(), 1.0) < 1e-5


def test_nnls_cd_matches_sklearn():
    X = make_counts(45, 30, seed=4)
    rng = np.random.RandomState(0)
    H = rng.gamma(2.0, 1.0, size=(6, 30))
    W_sk, _, n_sk = non_negative_factorization(
        X, H=H, n_components=6, update_H=False, init=None,
        solver="cd", beta_loss="frobenius", tol=1e-4, max_iter=400,
    )
    W, n_iter = nnls_coordinate_descent(
        jnp.asarray(X), jnp.asarray(H), tol=1e-4, max_iter=400
    )
    assert n_iter == n_sk
    assert np.max(np.abs(np.asarray(W) - W_sk)) / max(W_sk.max(), 1.0) < 1e-6


def test_nnls_mu_matches_sklearn():
    X = make_counts(35, 20, seed=6)
    rng = np.random.RandomState(2)
    H = rng.gamma(2.0, 1.0, size=(5, 20))
    W_sk, _, n_sk = non_negative_factorization(
        X, H=H, n_components=5, update_H=False, init=None,
        solver="mu", beta_loss="kullback-leibler", tol=1e-4, max_iter=300,
    )
    W, n_iter = nnls_multiplicative_update(
        jnp.asarray(X), jnp.asarray(H), beta=1.0, tol=1e-4, max_iter=300, chunk=1
    )
    assert n_iter == n_sk
    assert np.max(np.abs(np.asarray(W) - W_sk)) / max(W_sk.max(), 1.0) < 1e-5


def test_nndsvd_matches_sklearn_bitwise():
    """nndsvd_init must be BIT-identical to sklearn's _initialize_nmf for
    the same seed: the reference passes init='nndsvd' straight into sklearn
    (reference cnmf.py:627), whose top-K SVD is the SEEDED randomized
    range-finder — so per-replicate inits genuinely differ, and our
    _randomized_topk_svd reproduces the recipe operation-for-operation
    (oversampling, power iterations, LU normalization, transpose heuristic,
    gesdd, svd_flip, RandomState consumption)."""
    from sklearn.decomposition._nmf import _initialize_nmf

    rng = np.random.RandomState(0)
    wide = np.abs(rng.randn(80, 120))   # transpose branch (rows < cols)
    tall = np.abs(rng.randn(150, 60))   # no-transpose branch
    for X in (wide, tall):
        for variant in ("nndsvd", "nndsvda", "nndsvdar"):
            for seed in (3, 14):
                Wr, Hr = _initialize_nmf(X, 5, init=variant,
                                         random_state=seed)
                W, H = nndsvd_init(X, 5, dtype=np.float64, variant=variant,
                                   seed=seed)
                np.testing.assert_array_equal(W, Wr)
                np.testing.assert_array_equal(H, Hr)


def test_nndsvd_init_reconstruction():
    X = make_counts(30, 20, seed=7)
    W, H = nndsvd_init(X, 4, dtype=np.float64)
    assert (W >= 0).all() and (H >= 0).all()
    # NNDSVD should already be a decent low-rank approximation
    base = np.linalg.norm(X) ** 2
    resid = np.linalg.norm(X - W @ H) ** 2
    assert resid < base


def test_k_padding_exact_noop():
    """Zero-padding the component axis must not change solver results: CD
    skips zero-hessian columns, MU keeps zero factors at zero."""
    X = make_counts(40, 30, seed=9)
    k, pad_k = 5, 8
    W0, H0 = random_init(X, k, 21, dtype=np.float64)
    W0p = np.pad(W0, ((0, 0), (0, pad_k - k)))
    Ht0p = np.pad(H0.T, ((0, 0), (0, pad_k - k)))

    W, Ht, n = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0[None]), jnp.asarray(H0.T[None]),
        tol=1e-4, max_iter=300,
    )
    Wp, Htp, np_ = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0p[None]), jnp.asarray(Ht0p[None]),
        tol=1e-4, max_iter=300,
    )
    assert int(n[0]) == int(np_[0])
    np.testing.assert_allclose(np.asarray(Wp[0, :, :k]), np.asarray(W[0]), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Htp[0, :, k:]), 0.0)

    Wm, Htm, nm = nmf_multiplicative_update(
        jnp.asarray(X), jnp.asarray(W0[None]), jnp.asarray(H0.T[None]),
        beta=1.0, tol=1e-4, max_iter=100, chunk=1,
    )
    Wmp, Htmp, nmp = nmf_multiplicative_update(
        jnp.asarray(X), jnp.asarray(W0p[None]), jnp.asarray(Ht0p[None]),
        beta=1.0, tol=1e-4, max_iter=100, chunk=1,
    )
    assert int(nm[0]) == int(nmp[0])
    np.testing.assert_allclose(np.asarray(Wmp[0, :, :k]), np.asarray(Wm[0]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Htmp[0, :, k:]), 0.0)


def test_compacted_cd_matches_plain():
    """Between-segment restart compaction must reproduce the plain batched
    solver exactly (same sweep counts, same factors)."""
    from cnmf_tpu.ops.nmf import nmf_coordinate_descent_compacted

    X = make_counts(80, 50, seed=12)
    k = 6
    seeds = list(range(31, 41))
    W0, Ht0 = random_init_batch(X, k, seeds, dtype=np.float64)

    Wp, Htp, n_p = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-4, max_iter=600
    )
    Wc, Htc, n_c = nmf_coordinate_descent_compacted(
        jnp.asarray(X), W0, Ht0, tol=1e-4, max_iter=600, seg_len=50, bucket=4
    )
    np.testing.assert_array_equal(np.asarray(n_p), n_c)
    np.testing.assert_allclose(np.asarray(Htp), Htc, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Wp), Wc, rtol=1e-10, atol=1e-12)


def test_kmeans_padding_exact():
    """Point/cluster padding in kmeans_fit must not change the fit."""
    from cnmf_tpu.ops.kmeans import kmeans_fit

    rng = np.random.RandomState(4)
    X = rng.rand(123, 20).astype(np.float64)
    l1, c1, i1 = kmeans_fit(X, 7, n_init=5, random_state=1,
                            pad_points_to=256, pad_clusters_to=8)
    l2, c2, i2 = kmeans_fit(X, 7, n_init=5, random_state=1,
                            pad_points_to=1, pad_clusters_to=1)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(c1, c2, rtol=1e-12)
    assert abs(i1 - i2) / i1 < 1e-12


def test_silhouette_padded_matches_sklearn():
    from sklearn.metrics import silhouette_score as sk_sil
    from cnmf_tpu.ops.silhouette import silhouette_score_padded

    rng = np.random.RandomState(7)
    X = rng.rand(237, 40)
    labels = rng.randint(0, 6, size=237)
    ours = silhouette_score_padded(X, labels, 6)
    ref = sk_sil(X, labels, metric="euclidean")
    assert abs(ours - ref) < 1e-9


def test_fused_k_stats_matches_unfused():
    """The single-dispatch K-stats program (ops/kstats.py) must reproduce the
    step-by-step path exactly: same kmeans labels/medians (pandas groupby
    median semantics), same NNLS refit, same silhouette and SSE."""
    import pandas as pd
    from cnmf_tpu.ops.kmeans import kmeans_fit
    from cnmf_tpu.ops.kstats import consensus_k_stats
    from cnmf_tpu.ops.nmf import reconstruction_sse
    from cnmf_tpu.ops.silhouette import silhouette_score_padded
    from cnmf_tpu.pipeline.solvers import refit_usages

    rng = np.random.RandomState(11)
    Xnc = rng.rand(60, 40)
    k = 4
    spectra = rng.rand(31, 40)  # odd row count: exercises exact-median branch
    l2 = spectra / np.linalg.norm(spectra, axis=1, keepdims=True)
    kwargs = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4,
              "max_iter": 400, "alpha_W": 0.0, "alpha_H": "same",
              "l1_ratio": 0.0}

    sil_f, sse_f = consensus_k_stats(jnp.asarray(Xnc), l2, k,
                                     solver="cd", beta=2.0,
                                     refit_tol=1e-4, refit_max_iter=400)

    labels, _, _ = kmeans_fit(l2, n_clusters=k, n_init=10, random_state=1)
    med = pd.DataFrame(l2).groupby(pd.Series(labels)).median()
    med = (med.T / med.sum(axis=1)).T
    usages = refit_usages(Xnc, med.values, kwargs, dtype=np.float64)
    sil_u = silhouette_score_padded(l2, labels, k)
    sse_u = float(reconstruction_sse(
        jnp.asarray(Xnc), jnp.asarray(usages), jnp.asarray(med.values)
    ))
    assert abs(float(sil_f) - sil_u) < 1e-10
    assert abs(float(sse_f) - sse_u) / sse_u < 1e-10


def test_fused_k_stats_mu_solver():
    """Fused stats with the MU/KL solver must match the step-by-step path
    (kmeans + pandas medians + MU refit + silhouette + SSE) exactly."""
    import pandas as pd
    from cnmf_tpu.ops.kmeans import kmeans_fit
    from cnmf_tpu.ops.kstats import consensus_k_stats
    from cnmf_tpu.ops.nmf import reconstruction_sse
    from cnmf_tpu.ops.silhouette import silhouette_score_padded
    from cnmf_tpu.pipeline.solvers import refit_usages

    rng = np.random.RandomState(3)
    Xnc = rng.rand(40, 30) + 0.01
    spectra = rng.rand(20, 30) + 0.01
    l2 = spectra / np.linalg.norm(spectra, axis=1, keepdims=True)
    sil, sse = consensus_k_stats(jnp.asarray(Xnc), l2, 3,
                                 solver="mu", beta=1.0,
                                 refit_tol=1e-4, refit_max_iter=100)
    kwargs = {"solver": "mu", "beta_loss": "kullback-leibler", "tol": 1e-4,
              "max_iter": 100, "alpha_W": 0.0, "alpha_H": "same",
              "l1_ratio": 0.0}
    labels, _, _ = kmeans_fit(l2, n_clusters=3, n_init=10, random_state=1)
    med = pd.DataFrame(l2).groupby(pd.Series(labels)).median()
    med = (med.T / med.sum(axis=1)).T
    usages = refit_usages(Xnc, med.values, kwargs, dtype=np.float64)
    sil_u = silhouette_score_padded(l2, labels, 3)
    sse_u = float(reconstruction_sse(
        jnp.asarray(Xnc), jnp.asarray(usages), jnp.asarray(med.values)
    ))
    assert abs(float(sil) - sil_u) < 1e-10
    assert abs(float(sse) - sse_u) / sse_u < 1e-8


def test_random_init_batch_device_properties():
    """Device-side batched init (the TPU fast path, ops/init.py): right
    shapes/dtype, zeroed K-bucket pad columns, the sklearn avg scale, and
    bitwise determinism from the seed vector (order-stable, independent of
    how the batch is split across calls — the worker-determinism contract)."""
    import numpy as _np

    from cnmf_tpu.ops.init import random_init_batch_device

    n, g, k, pad_k = 60, 40, 5, 8
    x_mean = 2.5
    seeds = _np.array([11, 7, 12345, 7], dtype=_np.int64)
    W0, Ht0 = random_init_batch_device(x_mean, n, g, k, seeds, pad_k=pad_k,
                                       dtype=_np.float32)
    W0, Ht0 = _np.asarray(W0), _np.asarray(Ht0)
    assert W0.shape == (4, n, pad_k) and Ht0.shape == (4, g, pad_k)
    assert W0.dtype == _np.float32
    assert not W0[:, :, k:].any() and not Ht0[:, :, k:].any()
    assert (W0[:, :, :k] >= 0).all() and (Ht0[:, :, :k] >= 0).all()
    # avg*|N(0,1)|: mean ~ avg*sqrt(2/pi)
    avg = _np.sqrt(x_mean / k)
    assert abs(W0[:, :, :k].mean() / (avg * _np.sqrt(2 / _np.pi)) - 1) < 0.1
    # same seed -> same draw, regardless of batch position
    _np.testing.assert_array_equal(W0[1], W0[3])
    # splitting the batch reproduces the same per-seed factors
    W0b, _ = random_init_batch_device(x_mean, n, g, k, seeds[2:3],
                                      pad_k=pad_k, dtype=_np.float32)
    _np.testing.assert_array_equal(_np.asarray(W0b)[0], W0[2])
    # different seeds -> different draws
    assert not _np.array_equal(W0[0], W0[1])


def test_nnls_from_products_matches_full_solver():
    """nnls_cd_from_products must be exactly the update_H=False solver: with
    the spectra fixed, HHt/XHt are loop-invariant, so feeding them in as
    products changes nothing — same sweep counts, same factors."""
    from cnmf_tpu.ops.nmf import (
        MATMUL_PRECISION,
        _shared_x_dot,
        nmf_coordinate_descent,
        nnls_cd_from_products,
    )

    rng = np.random.RandomState(4)
    N, G, K, B = 60, 45, 6, 3
    X = jnp.asarray(rng.gamma(1.0, 1.0, size=(N, G)))
    Ht0 = jnp.asarray(np.abs(rng.standard_normal((B, G, K))))
    W0 = jnp.zeros((B, N, K), X.dtype)

    for l1, l2 in [(0.0, 0.0), (0.7, 0.3)]:
        W_full, _, n_full = nmf_coordinate_descent(
            X, W0, Ht0, tol=1e-4, max_iter=150, update_H=False,
            l1_reg_W=l1, l2_reg_W=l2,
        )
        gram = jnp.einsum(
            "bgk,bgl->bkl", Ht0, Ht0, preferred_element_type=X.dtype,
            precision=MATMUL_PRECISION,
        )
        P = _shared_x_dot(X, Ht0)
        W_prod, n_prod = nnls_cd_from_products(
            gram, P, W0, tol=1e-4, max_iter=150, l1_reg=l1, l2_reg=l2,
        )
        np.testing.assert_array_equal(np.asarray(n_full), np.asarray(n_prod))
        np.testing.assert_array_equal(np.asarray(W_full), np.asarray(W_prod))


def test_nnls_from_products_transposed_problem():
    """The transpose-free spectra refit: products of the transposed problem
    computed by contraction equal solving on a materialized X.T."""
    from cnmf_tpu.ops.nmf import (
        MATMUL_PRECISION,
        nmf_coordinate_descent,
        nnls_cd_from_products,
    )

    rng = np.random.RandomState(11)
    N, G, K = 80, 30, 5
    X = jnp.asarray(rng.gamma(1.0, 1.0, size=(N, G)))
    U = jnp.asarray(np.abs(rng.standard_normal((N, K))))  # fixed usages

    # reference: solve on the materialized transpose
    W_ref, _, n_ref = nmf_coordinate_descent(
        X.T, jnp.zeros((1, G, K), X.dtype), U[None],
        tol=1e-4, max_iter=200, update_H=False,
    )
    gram = jnp.einsum(
        "nk,nl->kl", U, U, preferred_element_type=X.dtype,
        precision=MATMUL_PRECISION,
    )[None]
    P = jnp.einsum(
        "ng,nk->gk", X, U, preferred_element_type=X.dtype,
        precision=MATMUL_PRECISION,
    )[None]
    W_t, n_t = nnls_cd_from_products(gram, P, jnp.zeros((1, G, K), X.dtype),
                                     tol=1e-4, max_iter=200)
    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_t))
    np.testing.assert_allclose(
        np.asarray(W_ref), np.asarray(W_t), rtol=1e-10, atol=1e-12
    )
