"""Fully fused consensus: one device program from Lloyd to the final refit.

The consensus stage (reference cnmf.py:823-1082) is a chain of device steps
— KMeans, cluster medians, an NNLS usage refit, a usage reordering, the
fixed-usage TPM spectra refit, the z-scored OLS grams and the final usage
refit — that the unfused pipeline runs as ~6 separate dispatches with a
host↔device synchronization between each. Through a remote/relayed TPU
every synchronization point costs link latency and a chance to queue behind
other tenants, so here the WHOLE post-seeding chain is one jitted program:
the host only runs the kmeans++ seeding (sklearn RNG scheme) before and one
(k×k) lstsq after, and fetches every artifact in a single drain.

All inputs may be cell-padded for even mesh sharding (parallel.mesh
.put_cells); padded rows are exactly neutral (zero NNLS rows, masked
moments) and per-cell outputs slice back on the host. Padded cluster slots
(K bucketing) carry zero spectra, zero usages and zero grams throughout and
sort after every real GEP in the usage reordering (stable argsort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.kmeans import _kmeans_plusplus, _lloyd_batched, _PAD_SENTINEL
from cnmf_tpu.ops.kstats import _cluster_medians
from cnmf_tpu.ops.nmf import (
    MATMUL_PRECISION,
    fixed_factor_gram,
    fixed_factor_product_transposed,
    nmf_multiplicative_update,
    nnls_cd_fixed_spectra,
    nnls_cd_from_products,
)


def _nnls(X, Ht0, W0, *, solver, beta, tol, max_iter, l1_reg, l2_reg,
          mu_chunk, use_pallas):
    """Fixed-spectra NNLS usage refit on device arrays (batch of 1).

    The CD branch runs the products-distilled refit
    (ops.nmf.nnls_cd_fixed_spectra): with the spectra fixed the full
    solver's per-sweep O(M·G·K) contractions collapse to one-time products
    + O(M·K²) half-sweeps — same sweeps, same stopping, same factors."""
    if solver == "cd":
        W, _ = nnls_cd_fixed_spectra(
            X, Ht0, W0, tol=tol, max_iter=max_iter,
            l1_reg=l1_reg, l2_reg=l2_reg,
        )
    else:
        W, _, _ = nmf_multiplicative_update(
            X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
            update_H=False, l1_reg_W=l1_reg, l2_reg_W=l2_reg,
            chunk=mu_chunk, use_pallas=use_pallas,
        )
    return W[0]


def _masked_col_sumsq_blocked(X, mean, rowmask, block: int = 2048):
    """Σ_rows (x − mean_col)² per column with padded rows masked out,
    accumulated in column blocks of ``block`` (one (N, block) temp at a time
    instead of a full (N, G) centered copy). The remainder columns run as
    one statically-shaped extra slice so no block ever reads out of bounds."""
    G = X.shape[1]

    def one(start, width):
        blk = jax.lax.dynamic_slice_in_dim(X, start, width, axis=1)
        m = jax.lax.dynamic_slice_in_dim(mean, start, width, axis=0)
        c = jnp.where(rowmask, blk - m[None, :], 0.0)
        return jnp.sum(jnp.square(c), axis=0)

    n_full = G // block
    parts = []
    if n_full:
        starts = jnp.arange(n_full) * block

        def body(carry, start):
            return carry, one(start, block)

        _, stacked = jax.lax.scan(body, 0, starts)
        parts.append(stacked.reshape(n_full * block))
    rem = G - n_full * block
    if rem:
        parts.append(one(n_full * block, rem))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def _mu_w0(X, n_real_rows, n_real_cols, k_real, n_rows_total, pad_k, dtype):
    """sklearn 'mu' W init sqrt(mean(X)/k) over the REAL elements, with
    padded rows pinned at zero (they then stay zero multiplicatively)."""
    avg = jnp.sqrt(
        jnp.sum(X) / (n_real_rows * n_real_cols) / k_real
    ).astype(dtype)
    W0 = jnp.full((1, n_rows_total, pad_k), avg, dtype)
    mask = jnp.arange(n_rows_total) < n_real_rows
    return W0 * mask[None, :, None].astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cluster_pad", "lloyd_max_iter", "solver", "beta", "tol",
        "max_iter", "mu_chunk", "use_pallas", "n_cells", "n_hvgs",
        "alpha_W", "l1_ratio", "refit_usage", "normalize_tpm",
        "zero_safe_std",
    ),
)
def _fused_consensus(
    Xnc,           # (Nt, G) normalized counts (cell-padded ok)
    tpm,           # (Nt2, Gall) full-gene TPM (cell-padded ok)
    Xp,            # (Rp, G) zero-padded, density-filtered L2 spectra
    centers0,      # (n_init, Kp, G) sentinel-padded kmeans++ seeds
    lloyd_tol,     # scalar
    n_points,      # scalar int32: real spectra rows
    n_clusters,    # scalar int32: real k
    tpm_std,       # (Gall,) prepare-stage per-gene TPM std
    hvg_idx,       # (H,) int32 indices of the HVGs within Gall
    *,
    n_cluster_pad: int,
    lloyd_max_iter: int,
    solver: str,
    beta: float,
    tol: float,
    max_iter: int,
    mu_chunk: int,
    use_pallas: bool,
    n_cells: int,          # real cell count (static: shapes pin the program)
    n_hvgs: int,
    alpha_W: float,
    l1_ratio: float,
    refit_usage: bool,
    normalize_tpm: bool,
    zero_safe_std: bool,
):
    dtype = Xnc.dtype
    Rp = Xp.shape[0]
    G = Xnc.shape[1]
    Gall = tpm.shape[1]
    Kp = n_cluster_pad

    def w_regs(n_features):
        # sklearn reg scaling for the W side (solvers.compute_regularization);
        # the H side never updates in these fixed-spectra refits
        return (
            float(n_features) * alpha_W * l1_ratio,
            float(n_features) * alpha_W * (1.0 - l1_ratio),
        )

    # ---- KMeans labels (best of n_init Lloyd runs) + cluster medians ----
    labels_all, inertia, _ = _lloyd_batched(
        Xp, centers0, lloyd_tol, n_points, n_clusters, lloyd_max_iter
    )
    labels = labels_all[jnp.argmin(inertia)]
    valid = jnp.arange(Rp) < n_points
    median = _cluster_medians(Xp, labels, valid, n_clusters, Kp)
    rowsum = jnp.sum(median, axis=1, keepdims=True)
    median_n = jnp.where(
        rowsum > 0, median / jnp.where(rowsum == 0, 1.0, rowsum), 0.0
    ).astype(dtype)

    # ---- NNLS usage refit on norm counts (reference cnmf.py:918-920) ----
    l1_nc, l2_nc = w_regs(G)
    Ht0 = jnp.transpose(median_n)[None]
    if solver == "cd":
        W0 = jnp.zeros((1, Xnc.shape[0], Kp), dtype)
    else:
        W0 = _mu_w0(Xnc, n_cells, G, n_clusters.astype(dtype),
                    Xnc.shape[0], Kp, dtype)
    rf = _nnls(Xnc, Ht0, W0, solver=solver, beta=beta, tol=tol,
               max_iter=max_iter, l1_reg=l1_nc, l2_reg=l2_nc,
               mu_chunk=mu_chunk, use_pallas=use_pallas)   # (Nt, Kp)

    # ---- reorder GEPs by total normalized usage (cnmf.py:938-946) ------
    usum = jnp.sum(rf, axis=1, keepdims=True)
    norm_usages = rf / jnp.where(usum == 0, 1.0, usum)
    order = jnp.argsort(-jnp.sum(norm_usages, axis=0))     # stable; pads last
    rf = rf[:, order]
    norm_usages = norm_usages[:, order]
    median_n = median_n[order, :]

    # ---- TPM-unit spectra via fixed-usage NNLS over ALL genes ----------
    # transpose trick (cnmf.py:948-955): X = tpmᵀ (Gall, Nt2), fixed
    # spectra = norm_usagesᵀ; padded cells are zero usage columns (exactly
    # neutral in the grams)
    l1_t, l2_t = w_regs(n_cells)
    # fixed spectra = norm_usagesᵀ (Kp, Nt); the solver's Ht layout is its
    # transpose — norm_usages itself
    usages_t = norm_usages[None]                           # (1, Nt, Kp)
    if usages_t.shape[1] < tpm.shape[0]:
        usages_t = jnp.pad(
            usages_t, ((0, 0), (0, tpm.shape[0] - usages_t.shape[1]), (0, 0))
        )
    else:
        usages_t = usages_t[:, :tpm.shape[0], :]
    if solver == "cd":
        # transpose-FREE: the CD refit only consumes the usage gram and the
        # product tpmᵀ·U, both computable by contraction over the cell axis —
        # no (Gall, Nt) copy of the TPM ever exists in HBM (at the 100k×20k
        # atlas config the materialized transpose alone is 8 GB and OOMs the
        # chip alongside the resident TPM)
        Wt0 = jnp.zeros((1, Gall, Kp), dtype)
        gram_u = fixed_factor_gram(usages_t)
        P_t = fixed_factor_product_transposed(usages_t, tpm)
        spectra_tpm, _ = nnls_cd_from_products(
            gram_u, P_t, Wt0, tol=tol, max_iter=max_iter,
            l1_reg=l1_t, l2_reg=l2_t,
        )
        spectra_tpm = spectra_tpm[0]                       # (Gall, Kp)
    else:
        tpm_t = jnp.transpose(tpm)
        Wt0 = _mu_w0(tpm_t, Gall, n_cells, n_clusters.astype(dtype),
                     Gall, Kp, dtype)
        spectra_tpm = _nnls(tpm_t, usages_t, Wt0, solver=solver, beta=beta,
                            tol=tol, max_iter=max_iter, l1_reg=l1_t,
                            l2_reg=l2_t, mu_chunk=mu_chunk,
                            use_pallas=use_pallas)         # (Gall, Kp)
    spectra_tpm = jnp.transpose(spectra_tpm)               # (Kp, Gall)
    if normalize_tpm:
        ssum = jnp.sum(spectra_tpm, axis=1, keepdims=True)
        spectra_tpm = jnp.where(
            ssum > 0, spectra_tpm / jnp.where(ssum == 0, 1.0, ssum) * 1e6, 0.0
        )

    # ---- z-score OLS grams (cnmf.py:55-125, 957-959) -------------------
    # two-pass masked column moments (one-pass cancels catastrophically in
    # f32 for high-mean TPM columns), accumulated over COLUMN BLOCKS so the
    # centered intermediate never materializes at (Nt, Gall) — at the
    # 100k×20k atlas config that temp is 8 GB and evicts the program from
    # HBM next to the resident TPM. The (k×k) lstsq runs on host.
    cellmask = (jnp.arange(tpm.shape[0]) < n_cells)[:, None]
    mean = jnp.sum(tpm, axis=0) / n_cells
    var = _masked_col_sumsq_blocked(tpm, mean, cellmask) / n_cells
    inv_std = 1.0 / jnp.sqrt(jnp.maximum(var, 1e-12))
    U = rf
    if U.shape[0] < tpm.shape[0]:
        U = jnp.pad(U, ((0, tpm.shape[0] - U.shape[0]), (0, 0)))
    else:
        U = U[:tpm.shape[0], :]
    XtX = jnp.dot(U.T, U, preferred_element_type=dtype,
                  precision=MATMUL_PRECISION)
    uty = jnp.dot(U.T, tpm, preferred_element_type=dtype,
                  precision=MATMUL_PRECISION)
    u_sum = jnp.sum(U, axis=0)
    XtY = (uty - u_sum[:, None] * mean[None, :]) * inv_std[None, :]

    # ---- final usage refit on std-scaled HVG TPM (cnmf.py:961-975) -----
    if refit_usage:
        tpm_hvg = tpm[:, hvg_idx]
        mh = jnp.sum(tpm_hvg, axis=0) / n_cells
        sqh = jnp.sum(tpm_hvg * tpm_hvg, axis=0) / n_cells
        varh = (sqh - mh * mh) * n_cells / (n_cells - 1)
        stdh = jnp.sqrt(jnp.maximum(varh, 0.0))
        if zero_safe_std:
            stdh = jnp.where(stdh == 0, 1.0, stdh)
        norm_tpm = tpm_hvg / stdh[None, :]
        spectra_rf = spectra_tpm[:, hvg_idx] / tpm_std[hvg_idx][None, :]
        l1_f, l2_f = w_regs(n_hvgs)
        Hf0 = jnp.transpose(spectra_rf)[None].astype(dtype)
        if solver == "cd":
            Wf0 = jnp.zeros((1, norm_tpm.shape[0], Kp), dtype)
        else:
            Wf0 = _mu_w0(norm_tpm, n_cells, n_hvgs,
                         n_clusters.astype(dtype), norm_tpm.shape[0], Kp,
                         dtype)
        final_usages = _nnls(
            norm_tpm.astype(dtype), Hf0, Wf0, solver=solver, beta=beta,
            tol=tol, max_iter=max_iter, l1_reg=l1_f, l2_reg=l2_f,
            mu_chunk=mu_chunk, use_pallas=use_pallas,
        )
    else:
        final_usages = rf

    return labels, median_n, rf, spectra_tpm, XtX, XtY, final_usages


def fused_consensus(
    Xnc,
    tpm,
    l2_spectra: np.ndarray,
    k: int,
    tpm_std: np.ndarray,
    hvg_idx: np.ndarray,
    n_cells: int,
    *,
    solver: str = "cd",
    beta: float = 2.0,
    tol: float = 1e-4,
    max_iter: int = 200,
    alpha_W: float = 0.0,
    l1_ratio: float = 0.0,
    mu_chunk: int = 8,
    use_pallas: bool = False,
    refit_usage: bool = True,
    normalize_tpm: bool = False,
    zero_safe_std: bool = True,
    n_init: int = 10,
    random_state: int = 1,
    lloyd_max_iter: int = 300,
    lloyd_tol: float = 1e-4,
    pad_points_to: int = 512,
    pad_clusters_to: int = 8,
):
    """Host wrapper: sklearn-style greedy kmeans++ seeding + shape padding,
    then ONE device dispatch for the entire consensus chain. Returns host
    arrays, sliced back to real sizes:

    (labels (R,), median_spectra (k, G), rf_usages (n_cells, k),
     spectra_tpm (k, Gall), usage_coef (k, Gall)).
    """
    X = np.ascontiguousarray(l2_spectra)
    R, _ = X.shape
    if R < k:
        raise ValueError(f"n_samples={R} should be >= n_clusters={k}")
    rng = np.random.RandomState(random_state)
    centers0 = np.stack([_kmeans_plusplus(X, k, rng) for _ in range(n_init)])
    scaled_tol = lloyd_tol * float(np.mean(np.var(X, axis=0)))

    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-k // pad_clusters_to) * pad_clusters_to
    Xpad = np.zeros((Rp, X.shape[1]), dtype=X.dtype)
    Xpad[:R] = X
    c0 = np.full((n_init, Kp, X.shape[1]), _PAD_SENTINEL, dtype=X.dtype)
    c0[:, :k] = centers0

    labels, median_n, rf, spectra_tpm, XtX, XtY, final_usages = \
        _fused_consensus(
            Xnc, tpm, Xpad, c0,
            np.asarray(scaled_tol, dtype=X.dtype),
            np.int32(R), np.int32(k),
            # host-side casts: an eager jnp.asarray with a dtype change
            # compiles its own convert_element_type program
            np.ascontiguousarray(tpm_std, dtype=Xnc.dtype),
            np.ascontiguousarray(hvg_idx, dtype=np.int32),
            n_cluster_pad=Kp, lloyd_max_iter=lloyd_max_iter,
            solver=solver, beta=float(beta), tol=float(tol),
            max_iter=int(max_iter), mu_chunk=mu_chunk,
            use_pallas=use_pallas, n_cells=int(n_cells),
            n_hvgs=int(len(hvg_idx)), alpha_W=float(alpha_W),
            l1_ratio=float(l1_ratio),
            refit_usage=bool(refit_usage), normalize_tpm=bool(normalize_tpm),
            zero_safe_std=bool(zero_safe_std),
        )

    # single drain: everything lands in one host round-trip window
    labels = np.asarray(labels)[:R]
    median_np = np.asarray(median_n)[:k]
    rf_np = np.asarray(final_usages)[:n_cells, :k]
    rf_init_np = np.asarray(rf)[:n_cells, :k]
    spectra_tpm_np = np.asarray(spectra_tpm)[:k]
    XtX_np = np.asarray(XtX, dtype=np.float64)[:k, :k]
    XtY_np = np.asarray(XtY, dtype=np.float64)[:k]

    # the (k × k) solve matches the unfused path's host lstsq semantics
    usage_coef, *_ = np.linalg.lstsq(XtX_np, XtY_np, rcond=None)
    return labels, median_np, rf_init_np, rf_np, spectra_tpm_np, usage_coef
