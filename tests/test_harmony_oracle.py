"""Numerical validation of the JAX Harmony implementation.

harmonypy itself is unreachable in this environment (no package index), so
the oracle below is an INDEPENDENT plain-loop float64 transcription of the
published algorithm (Korsunsky et al. 2019; semantics of reference
preprocess.py:362-422 / harmonypy): diversity-penalized soft k-means with
blocked R updates, alternated with the mixture-of-experts ridge that
corrects the ORIGINAL embedding each iteration, intercept excluded.

Both implementations consume identical deterministic inputs (same kmeans++
centers, same block-permutation pool), early stopping is disabled, and the
converged responsibilities / corrected embeddings / X-corrections must
agree to float32-accumulation tolerance."""

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu.harmony import moe_correct_ridge_X, run_harmony
from cnmf_tpu.ops.kmeans import kmeans_fit

MAX_H = 3        # harmony iterations (early stop disabled)
MAX_K = 5        # clustering rounds per iteration
SIGMA = 0.1
BLOCK_SIZE = 0.05
SEED = 0


@pytest.fixture(scope="module")
def batch_data():
    rng = np.random.RandomState(7)
    n_per, d = 120, 8
    base = rng.standard_normal((n_per, d))
    shift = rng.standard_normal(d) * 1.5
    Z = np.vstack([base, base @ np.diag(1 + 0.1 * rng.rand(d)) + shift])
    meta = pd.DataFrame({"batch": ["a"] * n_per + ["b"] * n_per})
    return Z.astype(np.float64), meta


def _oracle_harmony(Z_rows, meta, nclust):
    """Loop-based float64 Harmony with the same deterministic inputs the
    JAX implementation derives: kmeans++ centers and the permutation pool
    drawn from RandomState(SEED)."""
    N, d = Z_rows.shape
    Z_orig = Z_rows.T.astype(np.float64)
    Z_cos = Z_orig / np.maximum(np.linalg.norm(Z_orig, axis=0), 1e-12)

    phi = pd.get_dummies(meta["batch"]).T.to_numpy().astype(np.float64)
    n_batches = phi.shape[0]
    Pr_b = phi.sum(axis=1) / N
    theta = np.ones(n_batches)
    lamb_diag = np.diag(np.insert(np.ones(n_batches), 0, 0.0))
    Phi_moe = np.vstack([np.ones(N), phi])

    # identical center init to run_harmony (deterministic given the seed)
    _, centers, _ = kmeans_fit(
        Z_cos.T.astype(np.float32), n_clusters=nclust, n_init=10,
        random_state=SEED, max_iter=25,
    )
    Y = centers.T.astype(np.float64)
    Y /= np.maximum(np.linalg.norm(Y, axis=0), 1e-12)

    # identical block-permutation pool to run_harmony
    rng = np.random.RandomState(SEED)
    n_blocks = int(np.ceil(1.0 / BLOCK_SIZE))
    L = int(np.ceil(N / n_blocks))
    pool = [rng.permutation(N) for _ in range(MAX_K)]

    def dist_to(Y):
        return 2.0 * (1.0 - Y.T @ Z_cos)

    D = dist_to(Y)
    R = -D / SIGMA
    R = np.exp(R - R.max(axis=0, keepdims=True))
    R /= R.sum(axis=0, keepdims=True)
    E = np.outer(R.sum(axis=1), Pr_b)
    O = R @ phi.T

    round_idx = 0
    for _ in range(MAX_H):
        for kit in range(MAX_K):
            D = dist_to(Y)
            S = -D / SIGMA
            S = np.exp(S - S.max(axis=0, keepdims=True))
            perm = pool[round_idx % MAX_K]
            round_idx += 1
            for b in range(n_blocks):
                cells = perm[b * L: (b + 1) * L]
                Rb, phib = R[:, cells], phi[:, cells]
                E -= np.outer(Rb.sum(axis=1), Pr_b)
                O -= Rb @ phib.T
                pen = np.power((E + 1.0) / (O + 1.0), theta[None, :]) @ phib
                R_new = S[:, cells] * pen
                R_new /= np.abs(R_new).sum(axis=0, keepdims=True)
                E += np.outer(R_new.sum(axis=1), Pr_b)
                O += R_new @ phib.T
                R[:, cells] = R_new
            Y = Z_cos @ R.T
            Y /= np.maximum(np.linalg.norm(Y, axis=0), 1e-12)
        # MOE ridge against the ORIGINAL embedding, intercept kept
        Z_corr = Z_orig.copy()
        for i in range(nclust):
            Phi_Rk = Phi_moe * R[i][None, :]
            W = np.linalg.solve(Phi_Rk @ Phi_moe.T + lamb_diag, Phi_Rk @ Z_orig.T)
            W[0, :] = 0.0
            Z_corr -= W.T @ Phi_Rk
        Z_cos = Z_corr / np.maximum(np.linalg.norm(Z_corr, axis=0), 1e-12)

    return Z_corr, R, Phi_moe, lamb_diag


@pytest.fixture(scope="module")
def both_runs(batch_data):
    Z, meta = batch_data
    nclust = 6
    result = run_harmony(
        Z, meta, ["batch"], sigma=SIGMA, nclust=nclust,
        block_size=BLOCK_SIZE, max_iter_harmony=MAX_H, max_iter_kmeans=MAX_K,
        epsilon_cluster=-1.0, epsilon_harmony=-1.0, random_state=SEED,
    )
    oracle = _oracle_harmony(Z, meta, nclust)
    return result, oracle


def test_responsibilities_match_oracle(both_runs):
    result, (_, R_oracle, *_) = both_runs
    assert result.R.shape == R_oracle.shape
    np.testing.assert_allclose(result.R, R_oracle, atol=5e-4)


def test_corrected_embedding_matches_oracle(both_runs):
    result, (Z_corr_oracle, *_) = both_runs
    scale = np.abs(Z_corr_oracle).max()
    np.testing.assert_allclose(
        result.Z_corr, Z_corr_oracle.T, atol=5e-4 * scale
    )


def test_correction_removes_batch_structure(both_runs, batch_data):
    Z, meta = batch_data
    result, _ = both_runs
    n_per = (meta["batch"] == "a").sum()
    before = np.linalg.norm(Z[:n_per].mean(0) - Z[n_per:].mean(0))
    after = np.linalg.norm(
        result.Z_corr[:n_per].mean(0) - result.Z_corr[n_per:].mean(0)
    )
    assert after < 0.25 * before


def test_moe_correct_x_matches_oracle(both_runs, batch_data):
    """The X-space correction (the reference's correct-X-not-PCs twist,
    preprocess.py:9-18,416-420) with the converged R must match a direct
    per-cluster solve, including the clip at 0."""
    Z, meta = batch_data
    result, (_, R_oracle, Phi_moe, lamb_diag) = both_runs
    rng = np.random.RandomState(1)
    X = np.abs(rng.standard_normal((Z.shape[0], 30))) * 3.0

    corrected = moe_correct_ridge_X(X, result, chunk_genes=16)

    Zx = X.T.astype(np.float64)
    Z_corr = Zx.copy()
    for i in range(result.K):
        Phi_Rk = Phi_moe * R_oracle[i][None, :]
        W = np.linalg.solve(Phi_Rk @ Phi_moe.T + lamb_diag, Phi_Rk @ Zx.T)
        W[0, :] = 0.0
        Z_corr -= W.T @ Phi_Rk
    expected = np.maximum(Z_corr.T, 0.0)
    np.testing.assert_allclose(
        corrected, expected, atol=5e-4 * np.abs(expected).max()
    )
