"""NMF factor initialization.

Reproduces sklearn's init schemes (the reference passes init='random' or
'nndsvd' through to sklearn, reference cnmf.py:627,1252):

* 'random': ``avg·|N(0,1)|`` with ``avg = sqrt(X.mean()/K)``, drawn from
  ``np.random.RandomState(seed)`` with H drawn before W — bit-identical to
  sklearn so a converged CD run lands in the same local optimum.
* 'nndsvd': nonnegative double SVD (Boutsidis & Gallopoulos 2008).

Initialization is a host-side numpy step (cheap relative to the solve; exact
RNG parity with the reference matters more than device residency here). The
batched variants stack per-seed factors along a leading restart axis.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import scipy.sparse as sp


def _x_mean(X) -> float:
    if sp.issparse(X):
        return float(X.sum()) / (X.shape[0] * X.shape[1])
    return float(np.mean(X))


def random_init(X, n_components: int, seed: int, dtype=np.float32):
    """sklearn init='random': H then W from RandomState(seed), |N(0,1)|·avg."""
    avg = np.sqrt(_x_mean(X) / n_components)
    rng = np.random.RandomState(seed)
    n_samples, n_features = X.shape
    H = avg * rng.standard_normal(size=(n_components, n_features))
    W = avg * rng.standard_normal(size=(n_samples, n_components))
    np.abs(H, out=H)
    np.abs(W, out=W)
    return W.astype(dtype, copy=False), H.astype(dtype, copy=False)


def random_init_batch(
    X, n_components: int, seeds: Sequence[int], dtype=np.float32
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack sklearn-compatible random inits: W0 (B,N,K), Ht0 (B,G,K)."""
    Ws, Hts = [], []
    for seed in seeds:
        W, H = random_init(X, n_components, int(seed), dtype=dtype)
        Ws.append(W)
        Hts.append(np.ascontiguousarray(H.T))
    return np.stack(Ws), np.stack(Hts)


def random_init_batch_device(
    x_mean: float, n_samples: int, n_features: int, n_components: int,
    seeds, pad_k: int = None, dtype=np.float32,
):
    """Device-resident batched random init: ``avg·|N(0,1)|`` per restart from
    a threefry key folded from that restart's table seed.

    The host path (random_init_batch) generates ~30 MB of noise per K and
    ships it over the host↔device link — at the measured ~32 MB/s relay
    upload rate that dominates factorize wall time. Here only the seed
    vector crosses the link and the TPU generates the noise itself.

    Determinism: fully reproducible from the replicate table's per-(K, iter)
    seeds, order-stable and worker-count-independent — same grid-determinism
    contract as the host path (SURVEY §2.10, which sanctions JAX PRNG keys
    in place of bit-identical sklearn streams). The DRAW differs from
    numpy's, so factorize outputs differ from a host-init run by one random
    sample; consensus statistics are equivalent. Opt out with
    CNMF_TPU_DEVICE_INIT=0 for sklearn-bit-identical spectra.

    Returns device arrays W0 (B, N, pad_k), Ht0 (B, G, pad_k) with
    components beyond ``n_components`` zeroed (the exact-no-op K bucketing).

    The true component count enters only as TRACED operands — the
    ``avg`` scale and a zeroing column mask — so every K sharing a pad
    bucket reuses ONE compiled program. The noise program was measured as
    THE factorize cold-start wall through axon's remote compiler: 9
    per-K compiles × 7-13 s ≈ 82 s of the round-3 111 s compile total,
    vs 2 per-bucket compiles after this change.
    """
    import jax.numpy as jnp

    pad_k = pad_k or n_components
    avg = np.dtype(dtype).type(np.sqrt(x_mean / n_components))
    kmask = (np.arange(pad_k) < n_components).astype(dtype)

    seeds = jnp.asarray(np.asarray(seeds, dtype=np.uint32))
    return _gen_device_init(
        seeds, jnp.asarray(avg, dtype=dtype), jnp.asarray(kmask),
        n=n_samples, g=n_features, pad_k=pad_k,
        dt=jnp.dtype(dtype),
    )


def draw_init_batch(seed_arr, avg_arr, kmask, *, n, g, pad_k, dt):
    """Traceable core of the device init: per-seed threefry draws at the
    bucket width, pad columns zeroed by the traced mask (0·|noise| is
    exact) — K stays out of the shapes. The draw is keyed ONLY by each
    restart's own seed, so any partition of the batch (chunks, mesh
    shards) reproduces identical factors. Shared by the single-device jit
    below and the shard_map factorize path (pipeline/solvers.py
    solve_nmf_sharded_device)."""
    import jax
    import jax.numpy as jnp

    def one(seed):
        key = jax.random.PRNGKey(seed)
        kh, kw = jax.random.split(key)
        Ht = jnp.abs(avg_arr * jax.random.normal(kh, (g, pad_k), dtype=dt))
        W = jnp.abs(avg_arr * jax.random.normal(kw, (n, pad_k), dtype=dt))
        return W * kmask, Ht * kmask

    return jax.vmap(one)(seed_arr)


# module scope so every restart chunk of every K hits the SAME jit cache
# entry — a closure re-created per call misses the cache and re-traces
@functools.lru_cache(maxsize=1)
def _gen_device_init_jit():
    import jax

    return functools.partial(
        jax.jit, static_argnames=("n", "g", "pad_k", "dt")
    )(draw_init_batch)


def _gen_device_init(*args, **kwargs):
    return _gen_device_init_jit()(*args, **kwargs)


def _randomized_topk_svd(X, k: int, seed):
    """Top-k SVD via the randomized range-finder recipe sklearn's NNDSVD
    init uses (Halko, Martinsson & Tropp 2011; reference cnmf.py:627 passes
    init='nndsvd' into sklearn, whose ``_initialize_nmf`` calls
    ``_randomized_svd`` with its defaults). Reproduced operation-for-
    operation — same oversampling (k+10), same power-iteration count
    (7 when k < 0.1·min(shape), else 4) and LU normalization, same
    transpose heuristic, same gesdd on the projected matrix, same svd_flip
    sign convention, same RandomState consumption — so for the same
    per-replicate seed the init is bit-identical to the reference's
    sklearn run. Works on dense or scipy-sparse X."""
    import scipy.linalg as sla

    rng = (seed if isinstance(seed, np.random.RandomState)
           else np.random.RandomState(seed))
    n_random = k + 10
    n_iter = 7 if k < 0.1 * min(X.shape) else 4
    transpose = X.shape[0] < X.shape[1]
    M = X.T if transpose else X
    Q = rng.normal(size=(M.shape[1], n_random))
    if M.dtype == np.float32:
        Q = Q.astype(np.float32, copy=False)
    if n_iter <= 2:
        def normalizer(x):
            return x, None
    else:
        def normalizer(x):
            return sla.lu(x, permute_l=True, check_finite=False)
    for _ in range(n_iter):
        Q, _ = normalizer(M @ Q)
        Q, _ = normalizer(M.T @ Q)
    Q, _ = sla.qr(M @ Q, mode="economic", check_finite=False)
    B = Q.T @ M
    if sp.issparse(B):
        B = np.asarray(B.todense())
    Uhat, s, Vt = sla.svd(np.asarray(B), full_matrices=False,
                          lapack_driver="gesdd")
    del B
    U = Q @ Uhat
    # svd_flip: u-based unless transposed (sklearn keeps sign(0) == 0)
    if not transpose:
        max_abs = np.argmax(np.abs(U), axis=0)
        signs = np.sign(U[max_abs, np.arange(U.shape[1])])
    else:
        max_abs = np.argmax(np.abs(Vt), axis=1)
        signs = np.sign(Vt[np.arange(Vt.shape[0]), max_abs])
    U = U * signs[None, :]
    Vt = Vt * signs[:, None]
    if transpose:
        return Vt[:k, :].T, s[:k], U[:, :k].T
    return U[:, :k], s[:k], Vt[:k, :]


def nndsvd_init(X, n_components: int, eps: float = 1e-6, dtype=np.float32,
                variant: str = "nndsvd", seed=None):
    """NNDSVD init (sklearn _initialize_nmf semantics, randomized top-K
    SVD seeded per replicate — so restarts differ exactly as the
    reference's sklearn runs do).

    variant: 'nndsvd' | 'nndsvda' (zeros → X.mean()) | 'nndsvdar'.
    """
    n = min(X.shape)
    if n_components > n:
        raise ValueError(
            f"nndsvd requires n_components <= min(X.shape) (= {n})"
        )
    U, S, V = _randomized_topk_svd(X, n_components, seed)

    W = np.zeros_like(U)
    H = np.zeros_like(V)
    W[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    H[0, :] = np.sqrt(S[0]) * np.abs(V[0, :])

    for j in range(1, n_components):
        x, y = U[:, j], V[j, :]
        x_p, y_p = np.maximum(x, 0), np.maximum(y, 0)
        x_n, y_n = np.abs(np.minimum(x, 0)), np.abs(np.minimum(y, 0))
        x_p_nrm, y_p_nrm = np.linalg.norm(x_p), np.linalg.norm(y_p)
        x_n_nrm, y_n_nrm = np.linalg.norm(x_n), np.linalg.norm(y_n)
        m_p, m_n = x_p_nrm * y_p_nrm, x_n_nrm * y_n_nrm
        if m_p > m_n:
            u, v, sigma = x_p / x_p_nrm, y_p / y_p_nrm, m_p
        else:
            u, v, sigma = x_n / x_n_nrm, y_n / y_n_nrm, m_n
        lbd = np.sqrt(S[j] * sigma)
        W[:, j] = lbd * u
        H[j, :] = lbd * v

    W[W < eps] = 0
    H[H < eps] = 0

    if variant == "nndsvda":
        avg = _x_mean(X)
        W[W == 0] = avg
        H[H == 0] = avg
    elif variant == "nndsvdar":
        rng = np.random.RandomState(seed)
        avg = _x_mean(X)
        W[W == 0] = np.abs(avg * rng.standard_normal(size=(W == 0).sum()) / 100)
        H[H == 0] = np.abs(avg * rng.standard_normal(size=(H == 0).sum()) / 100)

    return W.astype(dtype, copy=False), H.astype(dtype, copy=False)


def nnls_w_init(X, n_components: int, solver: str, dtype=np.float32) -> np.ndarray:
    """W init for fixed-H refits (sklearn _check_w_h, update_H=False):
    zeros for CD, sqrt(X.mean()/K) for MU."""
    n_samples = X.shape[0]
    if solver == "mu":
        avg = np.sqrt(_x_mean(X) / n_components)
        return np.full((n_samples, n_components), avg, dtype=dtype)
    return np.zeros((n_samples, n_components), dtype=dtype)
