"""Harmony batch correction in JAX (Korsunsky et al. 2019).

Replaces the harmonypy dependency the reference shells out to
(reference preprocess.py:362-422). The algorithm: soft k-means over the PCA
embedding with a batch-diversity penalty (R-updates in random cell blocks),
alternated with a mixture-of-experts ridge regression that subtracts
batch-specific components. The reference's distinctive twist is kept: the
converged cluster responsibilities correct the **expression matrix** itself,
not just the PCs (``moe_correct_ridge`` on X, reference preprocess.py:9-18,
416-420).

Device layout: cells are the contraction axis of every hot matmul
(R·Φᵀ, Y·R, Φ_Rk·Zᵀ), so everything maps onto the MXU; the per-cluster ridge
solves are (B+1)×(B+1) — trivial. The block R-update loop is a
``lax.fori_loop`` over equal-size permuted cell blocks.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cnmf_tpu.ops.kmeans import kmeans_fit
from cnmf_tpu.ops.nmf import MATMUL_PRECISION


def _one_hot_phi(meta_data: pd.DataFrame, vars_use: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Stacked one-hot membership (levels × cells) + levels-per-variable."""
    dummies = [pd.get_dummies(meta_data[v]) for v in vars_use]
    phi = pd.concat(dummies, axis=1).T.to_numpy().astype(np.float32)
    phi_n = np.array([d.shape[1] for d in dummies])
    return phi, phi_n


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def _update_R_blocked(scale_dist, R, E, O, phi, Pr_b, theta, block_idx, block_mask,
                      n_blocks: int):
    """Diversity-penalized soft assignment updates over permuted cell blocks.

    scale_dist: (K, N) exp(-dist/sigma) (already max-subtracted);
    block_idx: (n_blocks, L) permuted cell indices (padded);
    block_mask: same shape, 1.0 for real cells.
    """
    def body(b, carry):
        R, E, O = carry
        # padded entries carry mask 0; their writes are masked to zero rows and
        # dropped via out-of-range indices so real columns are never aliased
        idx = block_idx[b]
        mask = block_mask[b]  # (L,)
        Rb = R.at[:, idx].get(mode="fill", fill_value=0.0) * mask[None, :]
        phib = phi.at[:, idx].get(mode="fill", fill_value=0.0) * mask[None, :]

        E = E - jnp.outer(jnp.sum(Rb, axis=1), Pr_b)
        O = O - jnp.dot(Rb, phib.T, precision=MATMUL_PRECISION)

        penalty = jnp.dot(
            jnp.power((E + 1.0) / (O + 1.0), theta[None, :]),
            phib, precision=MATMUL_PRECISION,
        )
        sd = scale_dist.at[:, idx].get(mode="fill", fill_value=0.0)
        R_new = sd * penalty
        norm = jnp.sum(jnp.abs(R_new), axis=0, keepdims=True)
        R_new = R_new / jnp.where(norm == 0, 1.0, norm)
        R_new = R_new * mask[None, :]

        E = E + jnp.outer(jnp.sum(R_new, axis=1), Pr_b)
        O = O + jnp.dot(R_new, phib.T, precision=MATMUL_PRECISION)
        R = R.at[:, idx].set(R_new, mode="drop")
        return R, E, O

    return jax.lax.fori_loop(0, n_blocks, body, (R, E, O))


@jax.jit
def _moe_correct_ridge(Z_orig, R, Phi_moe, lamb_diag):
    """Subtract per-cluster batch components: for each cluster k,
    W = (Φ_Rk Φ_moeᵀ + Λ)⁻¹ Φ_Rk Z_origᵀ with the intercept row zeroed,
    then Z_corr -= Wᵀ Φ_Rk (reference preprocess.py:9-18)."""
    K = R.shape[0]

    def body(i, Z_corr):
        Phi_Rk = Phi_moe * R[i, :][None, :]  # (B+1, N)
        x = jnp.dot(Phi_Rk, Phi_moe.T, precision=MATMUL_PRECISION) + lamb_diag
        rhs = jnp.dot(Phi_Rk, Z_orig.T, precision=MATMUL_PRECISION)  # (B+1, d)
        W = jnp.linalg.solve(x, rhs)
        W = W.at[0, :].set(0.0)  # do not remove the intercept
        return Z_corr - jnp.dot(W.T, Phi_Rk, precision=MATMUL_PRECISION)

    return jax.lax.fori_loop(0, K, body, Z_orig)


def _safe_entropy(R):
    return jnp.where(R > 0, R * jnp.log(jnp.maximum(R, 1e-30)), 0.0)


class HarmonyResult:
    """Converged Harmony state (cells-as-rows layout)."""

    def __init__(self, Z_corr, R, Phi_moe, lamb_diag, K, objectives):
        self.Z_corr = Z_corr          # (N, d) corrected embedding
        self.R = R                    # (K, N) responsibilities
        self.Phi_moe = Phi_moe        # (B+1, N) design with intercept
        self.lamb = lamb_diag         # (B+1, B+1) ridge penalty
        self.K = K
        self.objective_harmony = objectives


def run_harmony(
    data_mat: np.ndarray,
    meta_data: pd.DataFrame,
    vars_use,
    theta=None,
    lamb=None,
    sigma: float = 0.1,
    nclust: Optional[int] = None,
    tau: float = 0,
    block_size: float = 0.05,
    max_iter_harmony: int = 10,
    max_iter_kmeans: int = 20,
    epsilon_cluster: float = 1e-5,
    epsilon_harmony: float = 1e-4,
    random_state: int = 0,
    verbose: bool = False,
) -> HarmonyResult:
    """Harmony on a cells × d embedding; returns the converged state."""
    if isinstance(vars_use, str):
        vars_use = [vars_use]
    N, d = data_mat.shape
    K = nclust if nclust is not None else int(min(np.round(N / 30.0), 100))
    K = max(K, 2)

    phi, phi_n = _one_hot_phi(meta_data, vars_use)
    n_levels = phi.shape[0]
    if theta is None:
        theta = np.repeat(1.0, len(phi_n))
    theta = np.repeat(np.atleast_1d(np.asarray(theta, dtype=np.float64)), phi_n) \
        if np.atleast_1d(theta).size == len(phi_n) else np.repeat(float(np.atleast_1d(theta)[0]), n_levels)
    if lamb is None:
        lamb = np.repeat(1.0, len(phi_n))
    lamb = np.repeat(np.atleast_1d(np.asarray(lamb, dtype=np.float64)), phi_n) \
        if np.atleast_1d(lamb).size == len(phi_n) else np.repeat(float(np.atleast_1d(lamb)[0]), n_levels)

    N_b = phi.sum(axis=1)
    Pr_b = (N_b / N).astype(np.float32)
    if tau > 0:
        theta = theta * (1 - np.exp(-((N_b / (K * tau)) ** 2)))
    theta = theta.astype(np.float32)

    sigma_vec = np.repeat(np.float32(sigma), K)
    lamb_diag = np.diag(np.insert(lamb, 0, 0)).astype(np.float32)
    Phi_moe = np.vstack([np.ones(N, dtype=np.float32), phi])

    Z_orig = np.ascontiguousarray(data_mat.T, dtype=np.float32)  # (d, N)
    Z_cos = Z_orig / np.maximum(np.linalg.norm(Z_orig, ord=2, axis=0), 1e-12)

    rng = np.random.RandomState(random_state)

    # init clusters: kmeans++ + Lloyd(25) on L2-normalized cells
    labels, centers, _ = kmeans_fit(
        Z_cos.T.astype(np.float32), n_clusters=K, n_init=10,
        random_state=random_state, max_iter=25,
    )
    Y = centers.T
    Y = Y / np.maximum(np.linalg.norm(Y, ord=2, axis=0), 1e-12)

    Yd = jnp.asarray(Y)
    Zc = jnp.asarray(Z_cos)
    Zo = jnp.asarray(Z_orig)
    phid = jnp.asarray(phi)
    Prb = jnp.asarray(Pr_b)
    thetad = jnp.asarray(theta)
    sig = jnp.asarray(sigma_vec)
    lambd = jnp.asarray(lamb_diag)
    Phi_moed = jnp.asarray(Phi_moe)

    @jax.jit
    def init_R(Y, Z_cos):
        dist = 2.0 * (1.0 - jnp.dot(Y.T, Z_cos, precision=MATMUL_PRECISION))
        R = -dist / sig[:, None]
        R = R - jnp.max(R, axis=0, keepdims=True)
        R = jnp.exp(R)
        R = R / jnp.sum(R, axis=0, keepdims=True)
        return R, dist

    R, dist_mat = init_R(Yd, Zc)
    E = jnp.outer(jnp.sum(R, axis=1), Prb)
    O = jnp.dot(R, phid.T, precision=MATMUL_PRECISION)

    @jax.jit
    def objective(R, dist_mat, E, O):
        kmeans_error = jnp.sum(R * dist_mat)
        entropy = jnp.sum(_safe_entropy(R) * sig[:, None])
        cross = jnp.sum(
            (R * sig[:, None])
            * jnp.dot(
                thetad[None, :] * jnp.log((O + 1.0) / (E + 1.0)), phid,
                precision=MATMUL_PRECISION,
            )
        )
        return kmeans_error + entropy + cross

    # block structure: permuted equal-length blocks with padding mask. The
    # cells reshuffle every R-update round (harmonypy reshuffles per
    # update_R call) — a pool of max_iter_kmeans permutations is precomputed
    # and indexed by round inside the fused device loop.
    n_blocks = int(np.ceil(1.0 / block_size))
    L = int(np.ceil(N / n_blocks))
    pad = n_blocks * L - N
    perms = []
    masks = []
    for _ in range(max_iter_kmeans):
        perm = rng.permutation(N)
        # pad with out-of-range indices: gathers fill with 0, scatters drop
        idx = np.concatenate([perm, np.full(pad, N, dtype=perm.dtype)])
        mask = np.concatenate([np.ones(N, np.float32), np.zeros(pad, np.float32)])
        perms.append(idx.reshape(n_blocks, L))
        masks.append(mask.reshape(n_blocks, L))
    block_idx_pool = jnp.asarray(np.stack(perms))    # (P, n_blocks, L)
    block_mask_pool = jnp.asarray(np.stack(masks))

    def kmeans_round(round_idx, Y, Z_cos, R, E, O):
        dist = 2.0 * (1.0 - jnp.dot(Y.T, Z_cos, precision=MATMUL_PRECISION))
        sd = -dist / sig[:, None]
        sd = jnp.exp(sd - jnp.max(sd, axis=0, keepdims=True))
        block_idx = block_idx_pool[round_idx % pool_size]
        block_mask = block_mask_pool[round_idx % pool_size]
        R, E, O = _update_R_blocked(sd, R, E, O, phid, Prb, thetad,
                                    block_idx, block_mask, n_blocks)
        Y = jnp.dot(Z_cos, R.T, precision=MATMUL_PRECISION)
        Y = Y / jnp.maximum(jnp.linalg.norm(Y, ord=2, axis=0), 1e-12)
        dist = 2.0 * (1.0 - jnp.dot(Y.T, Z_cos, precision=MATMUL_PRECISION))
        return Y, R, E, O, dist

    pool_size = block_idx_pool.shape[0]

    @jax.jit
    def harmony_iteration(Y, Z_cos, R, E, O, round0):
        """One full Harmony iteration as a single device program: clustering
        rounds to convergence (a lax.while_loop — no host round-trips), then
        the MOE ridge correction of the embedding."""
        def cond(state):
            kit, done, *_ = state
            return jnp.logical_and(kit < max_iter_kmeans, jnp.logical_not(done))

        def body(state):
            kit, _, Y, R, E, O, prev_obj, obj = state
            Y, R, E, O, dist = kmeans_round(round0 + kit, Y, Z_cos, R, E, O)
            new_obj = objective(R, dist, E, O)
            done = jnp.logical_and(
                kit > 2,
                jnp.abs(obj - new_obj) / jnp.maximum(jnp.abs(obj), 1e-12)
                < epsilon_cluster,
            )
            return kit + 1, done, Y, R, E, O, obj, new_obj

        inf = jnp.full((), jnp.inf, dtype=Z_cos.dtype)
        state0 = (
            jnp.zeros((), jnp.int32), jnp.zeros((), bool),
            Y, R, E, O, inf, inf,
        )
        kit_done, _, Y, R, E, O, _, obj = jax.lax.while_loop(cond, body, state0)

        Zcorr = _moe_correct_ridge(Zo, R, Phi_moed, lambd)
        Z_cos = Zcorr / jnp.maximum(
            jnp.linalg.norm(Zcorr, ord=2, axis=0, keepdims=True), 1e-12
        )
        return Y, Z_cos, Zcorr, R, E, O, obj, kit_done

    objectives = []
    round_offset = 0
    for it in range(max_iter_harmony):
        Yd, Zc, Zcorr, R, E, O, obj_dev, kit_done = harmony_iteration(
            Yd, Zc, R, E, O, jnp.asarray(round_offset, jnp.int32)
        )
        round_offset += int(kit_done)
        obj = float(obj_dev)
        objectives.append(obj)
        if verbose:
            print(f"harmony iter {it}: objective {obj:.4f}")
        if it > 0:
            prev, cur = objectives[-2], objectives[-1]
            if abs(prev - cur) / max(abs(prev), 1e-12) < epsilon_harmony:
                break

    return HarmonyResult(
        Z_corr=np.asarray(Zcorr).T,
        R=np.asarray(R),
        Phi_moe=np.asarray(Phi_moed),
        lamb_diag=np.asarray(lambd),
        K=K,
        objectives=objectives,
    )


def moe_correct_ridge_X(X: np.ndarray, result: HarmonyResult,
                        chunk_genes: int = 4096) -> np.ndarray:
    """Apply the converged MOE ridge correction to an expression matrix
    (cells × genes), clipping negatives to 0 — the reference's
    correct-X-not-PCs semantics (preference preprocess.py:338,416-420)."""
    R = jnp.asarray(result.R)
    Phi_moe = jnp.asarray(result.Phi_moe)
    lamb = jnp.asarray(result.lamb)

    G = X.shape[1]
    out = np.empty_like(X, dtype=np.float32)
    for start in range(0, G, chunk_genes):
        end = min(start + chunk_genes, G)
        Z = jnp.asarray(np.ascontiguousarray(X[:, start:end].T, dtype=np.float32))
        Zc = _moe_correct_ridge(Z, R, Phi_moe, lamb)
        out[:, start:end] = np.maximum(np.asarray(Zc).T, 0.0)
    return out
