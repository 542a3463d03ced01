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


def _consensus_chain(
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


# the post-seeding program (host kmeans++ path): same trace as before the
# round-5 refactor — _consensus_chain holds the body so the full-chain
# program below can reuse it verbatim
_fused_consensus = functools.partial(
    jax.jit,
    static_argnames=(
        "n_cluster_pad", "lloyd_max_iter", "solver", "beta", "tol",
        "max_iter", "mu_chunk", "use_pallas", "n_cells", "n_hvgs",
        "alpha_W", "l1_ratio", "refit_usage", "normalize_tpm",
        "zero_safe_std",
    ),
)(_consensus_chain)


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


# ----------------------------------------------------------------------
# round-5: the WHOLE consensus — KNN density -> filter -> kmeans++ seeding
# -> chain — as ONE device program (VERDICT #2). The host kmeans++ seeding
# previously sat between the density program and the chain program, forcing
# a device->host->device synchronization mid-consensus and one extra cold
# compile (~4.7 s census). Here the greedy seeding runs on device
# (threefry-keyed — SURVEY §2.10 sanctions JAX PRNG in place of the
# bit-identical numpy stream; same greedy n_local_trials scheme, so cluster
# quality matches), the density filter packs surviving rows in place
# (stable argsort — static shapes), and the host only draws the key and
# fetches one drain.
# ----------------------------------------------------------------------


def _device_kmeanspp(Xp, x_sq, w, n_points, n_clusters, key, *,
                     n_cluster_pad: int, n_local_trials: int):
    """Greedy kmeans++ (sklearn _kmeans_plusplus semantics, uniform
    weights) over packed valid rows (``w`` = 1.0 for rows < n_points, else
    0.0 — invalid rows carry zero potential mass so the cumsum sampling
    never lands on them). Returns (Kp, G) centers, sentinel rows past
    ``n_clusters``."""
    R, G = Xp.shape
    dtype = Xp.dtype

    k_first, k_loop = jax.random.split(key)
    # first center: uniform over the n_points packed-front valid rows
    # (host twin: rng.randint(n_samples) over the filtered matrix)
    u0 = jax.random.uniform(k_first, (), dtype=jnp.float32)
    first = jnp.minimum(
        (u0 * n_points.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(n_points - 1, 0),
    )
    centers = jnp.full((n_cluster_pad, G), _PAD_SENTINEL, dtype)
    c0 = Xp[first]
    centers = centers.at[0].set(c0)

    def sq_dist_rows(points):
        # ||x - p||^2 via the gram trick, clipped at 0, invalid rows zeroed
        p_sq = jnp.sum(points * points, axis=1)
        d2 = x_sq[None, :] + p_sq[:, None] - 2.0 * jnp.dot(
            points, Xp.T, preferred_element_type=dtype,
            precision=MATMUL_PRECISION,
        )
        return jnp.maximum(d2, 0.0) * w[None, :]

    closest = sq_dist_rows(c0[None])[0]
    current_pot = jnp.sum(closest)

    def step(c, carry):
        centers, closest, current_pot = carry
        kc = jax.random.fold_in(k_loop, c)
        rand_vals = jax.random.uniform(
            kc, (n_local_trials,), dtype=jnp.float32
        ).astype(dtype) * current_pot
        cum = jnp.cumsum(closest)
        ids = jnp.searchsorted(cum, rand_vals)
        ids = jnp.clip(ids, 0, jnp.maximum(n_points - 1, 0))
        cand = Xp[ids]                                  # (trials, G)
        d2c = jnp.minimum(closest[None, :], sq_dist_rows(cand))
        pots = jnp.sum(d2c, axis=1)                     # (trials,)
        best = jnp.argmin(pots)
        active = c < n_clusters
        centers = jnp.where(
            active, centers.at[c].set(cand[best]), centers
        )
        closest = jnp.where(active, d2c[best], closest)
        current_pot = jnp.where(active, pots[best], current_pot)
        return centers, closest, current_pot

    centers, _, _ = jax.lax.fori_loop(
        1, n_cluster_pad, step, (centers, closest, current_pot)
    )
    return centers


def _l2_normalize_pad(raw, r_pad: int):
    """L2 row normalization + zero-pad to the point bucket, traced in-program
    — the host's ``values / sqrt((values**2).sum(1))`` (consensus L2 step,
    reference cnmf.py:880) for a device-resident RAW spectra twin. All-zero
    rows (impossible for converged NMF spectra but cheap to guard) stay zero
    instead of dividing by 0. Shared by the fused consensus and the twin-fed
    K-stats program so the normalization cannot diverge between them."""
    norms = jnp.sqrt(jnp.sum(raw * raw, axis=1, keepdims=True))
    l2n = raw / jnp.where(norms > 0, norms, 1.0)
    return (
        jnp.zeros((r_pad, raw.shape[1]), raw.dtype).at[: raw.shape[0]].set(l2n)
    )


def _seed_kmeanspp_batch(Xp, w, n_points, n_clusters, key, *, n_init: int,
                         n_cluster_pad: int, n_local_trials: int):
    """n_init independent greedy kmeans++ seedings (threefry-keyed device
    variant) over the weighted point set — the in-program replacement for
    sklearn's numpy-seeded loop (SURVEY §2.10-sanctioned RNG swap). Shared
    by the fused consensus and the twin-fed K-stats program."""
    x_sq = jnp.sum(Xp * Xp, axis=1) * w
    keys = jax.random.split(key, n_init)
    return jax.vmap(
        lambda kk: _device_kmeanspp(
            Xp, x_sq, w, n_points, n_clusters, kk,
            n_cluster_pad=n_cluster_pad, n_local_trials=n_local_trials,
        )
    )(keys)


def _knn_density_inline(Xp, n_real, n_neighbors):
    """KNN local density on padded rows, traced inline so the density folds
    into the consensus program — the SAME body as the standalone jitted
    program (ops/distance._knn_density_body), so the two paths cannot
    diverge."""
    from cnmf_tpu.ops.distance import _knn_density_body

    return _knn_density_body(Xp, n_real, n_neighbors)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cluster_pad", "n_init", "n_local_trials", "lloyd_max_iter",
        "solver", "beta", "tol", "max_iter", "mu_chunk", "use_pallas",
        "n_cells", "n_hvgs", "alpha_W", "l1_ratio", "refit_usage",
        "normalize_tpm", "zero_safe_std", "normalize_rows", "r_pad",
    ),
)
def _fused_consensus_full(
    Xnc,           # (Nt, G) normalized counts (cell-padded ok)
    tpm,           # (Nt2, Gall) full-gene TPM (cell-padded ok)
    l2p,           # (Rp, G) zero-padded FULL L2 spectra (unfiltered) — or,
                   # with normalize_rows=True, the (R, G) RAW merged spectra
                   # (device-resident from a same-process factorize): rows
                   # are L2-normalized and zero-padded to r_pad HERE, so no
                   # host copy of the spectra ever crosses the link
    density_in,    # (Rp,) cached density values (zeros when none)
    use_cached,    # scalar bool: pick density_in over the recompute
    thresh,        # scalar: density threshold
    n_spectra,     # scalar int32: real spectra rows
    n_neighbors,   # scalar int32
    key,           # threefry key for the kmeans++ seeding
    lloyd_tol,     # scalar: UNSCALED sklearn tol (scaled by mean var here)
    n_clusters,    # scalar int32: real k
    tpm_std,
    hvg_idx,
    *,
    n_cluster_pad: int,
    n_init: int,
    n_local_trials: int,
    lloyd_max_iter: int,
    solver: str,
    beta: float,
    tol: float,
    max_iter: int,
    mu_chunk: int,
    use_pallas: bool,
    n_cells: int,
    n_hvgs: int,
    alpha_W: float,
    l1_ratio: float,
    refit_usage: bool,
    normalize_tpm: bool,
    zero_safe_std: bool,
    normalize_rows: bool = False,
    r_pad: int = 0,
):
    dtype = l2p.dtype
    if normalize_rows:
        # device-resident raw spectra twin: normalize + pad in-program
        l2p = _l2_normalize_pad(l2p, r_pad)
    Rp = l2p.shape[0]
    # density: always traced (one program identity for hit and miss; the
    # recompute is one R×R matmul + the min-extraction loop, trivial device
    # work), the cached VALUES win bitwise when present
    density = jnp.where(
        use_cached, density_in.astype(dtype),
        _knn_density_inline(l2p, n_spectra, n_neighbors),
    )
    row_real = jnp.arange(Rp) < n_spectra
    keep = jnp.logical_and(density < thresh, row_real)
    n_points = jnp.sum(keep).astype(jnp.int32)
    # pack surviving rows to the front IN ORIGINAL ORDER (stable argsort of
    # the drop mask) — the host's boolean filter produces the same order, so
    # labels[:n_points] line up with the filtered index
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    Xp = l2p[order]
    w = (jnp.arange(Rp) < n_points).astype(dtype)

    # sklearn scales tol by the mean per-feature variance of the FILTERED
    # spectra (two-pass, padded rows masked)
    n_safe = jnp.maximum(n_points, 1).astype(dtype)
    mean_c = jnp.sum(Xp * w[:, None], axis=0) / n_safe
    var_c = jnp.sum(jnp.square(Xp - mean_c[None, :]) * w[:, None], axis=0) \
        / n_safe
    scaled_tol = (lloyd_tol * jnp.mean(var_c)).astype(dtype)

    centers0 = _seed_kmeanspp_batch(
        Xp, w, n_points, n_clusters, key, n_init=n_init,
        n_cluster_pad=n_cluster_pad, n_local_trials=n_local_trials,
    )

    labels, median_n, rf, spectra_tpm, XtX, XtY, final_usages = \
        _consensus_chain(
            Xnc, tpm, Xp, centers0, scaled_tol, n_points, n_clusters,
            tpm_std, hvg_idx,
            n_cluster_pad=n_cluster_pad, lloyd_max_iter=lloyd_max_iter,
            solver=solver, beta=beta, tol=tol, max_iter=max_iter,
            mu_chunk=mu_chunk, use_pallas=use_pallas, n_cells=n_cells,
            n_hvgs=n_hvgs, alpha_W=alpha_W, l1_ratio=l1_ratio,
            refit_usage=refit_usage, normalize_tpm=normalize_tpm,
            zero_safe_std=zero_safe_std,
        )
    return (density, n_points, labels, median_n, rf, spectra_tpm, XtX,
            XtY, final_usages)


def fused_consensus_full(
    Xnc,
    tpm,
    l2_spectra: np.ndarray,
    k: int,
    tpm_std: np.ndarray,
    hvg_idx: np.ndarray,
    n_cells: int,
    *,
    density_threshold: float,
    n_neighbors: int,
    cached_density: np.ndarray = None,
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
    """Host wrapper for the WHOLE consensus as one device dispatch —
    density (or the cached values), filter, device kmeans++ seeding, Lloyd,
    medians, refits, OLS grams — with one result drain. Raises the
    reference's zero-survivors / n_samples errors after inspecting the
    returned survivor count. Returns

    ``(density (R,), labels (n_kept,), median_spectra (k, G),
       rf_init (n_cells, k), rf_final (n_cells, k), spectra_tpm (k, Gall),
       usage_coef (k, Gall))``

    where the caller recovers the filter mask as ``density < threshold``.

    ``l2_spectra`` may be a DEVICE array of the RAW (un-normalized) merged
    spectra — e.g. the packed true-K buffer a same-process factorize left on
    device — in which case the L2 row normalization and the point-bucket
    zero-pad run inside the program and no spectra bytes cross the link.
    """
    on_device = isinstance(l2_spectra, jax.Array)
    if on_device:
        R = l2_spectra.shape[0]
        np_dtype = np.dtype(l2_spectra.dtype)
    else:
        X = np.ascontiguousarray(l2_spectra)
        R = X.shape[0]
        np_dtype = X.dtype
    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-k // pad_clusters_to) * pad_clusters_to
    if on_device:
        l2p = l2_spectra
    else:
        l2p = np.zeros((Rp, X.shape[1]), dtype=np_dtype)
        l2p[:R] = X
    use_cached = cached_density is not None
    dens_in = np.zeros(Rp, dtype=np_dtype)
    if use_cached:
        vals64 = np.asarray(cached_density, dtype=np.float64).ravel()
        v = vals64.astype(np_dtype)
        if np_dtype != np.float64:
            # the caller's filter mask is the HOST f64 compare
            # (local_density < threshold); a cached value whose rounding to
            # the compute dtype crosses the (rounded) threshold would make
            # the in-program keep disagree — misaligning the packed labels
            # with the caller's kept_index. Nudge exactly those rows to the
            # correct side (their density output is never saved on the
            # cached path, so the nudge is invisible outside the compare).
            t_lo = np_dtype.type(density_threshold)
            keep64 = vals64 < float(density_threshold)
            wrong = (v < t_lo) != keep64
            if wrong.any():
                v = v.copy()
                v[wrong & keep64] = np.nextafter(
                    t_lo, np_dtype.type(-np.inf)
                )
                v[wrong & ~keep64] = t_lo
        dens_in[:R] = v

    # threefry key words built on host — an eager jax.random.PRNGKey would
    # dispatch its own tiny seeding program through the relay
    seed = int(random_state)
    key = np.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                   dtype=np.uint32)

    (density, n_points, labels, median_n, rf, spectra_tpm, XtX, XtY,
     final_usages) = _fused_consensus_full(
        Xnc, tpm, l2p, dens_in, np.bool_(use_cached),
        np.asarray(density_threshold, dtype=np_dtype),
        np.int32(R), np.int32(n_neighbors),
        key,
        np.asarray(lloyd_tol, dtype=np_dtype), np.int32(k),
        # Xnc.dtype, NOT np.asarray(Xnc).dtype: Xnc is usually a committed
        # device array and np.asarray would fetch the WHOLE matrix through
        # the relay just to read its dtype
        np.ascontiguousarray(tpm_std, dtype=Xnc.dtype),
        np.ascontiguousarray(hvg_idx, dtype=np.int32),
        n_cluster_pad=Kp, n_init=int(n_init),
        n_local_trials=2 + int(np.log(k)), lloyd_max_iter=lloyd_max_iter,
        solver=solver, beta=float(beta), tol=float(tol),
        max_iter=int(max_iter), mu_chunk=mu_chunk, use_pallas=use_pallas,
        n_cells=int(n_cells), n_hvgs=int(len(hvg_idx)),
        alpha_W=float(alpha_W), l1_ratio=float(l1_ratio),
        refit_usage=bool(refit_usage), normalize_tpm=bool(normalize_tpm),
        zero_safe_std=bool(zero_safe_std),
        normalize_rows=on_device, r_pad=Rp if on_device else 0,
    )

    # single drain; survivor-count errors mirror the reference's
    n_kept = int(n_points)
    if n_kept == 0:
        raise RuntimeError(
            "Zero components remain after density filtering. "
            "Consider increasing density threshold"
        )
    if n_kept < k:
        raise ValueError(
            f"n_samples={n_kept} should be >= n_clusters={k}"
        )
    density_np = np.asarray(density, dtype=np.float64)[:R]
    labels_np = np.asarray(labels)[:n_kept]
    median_np = np.asarray(median_n)[:k]
    rf_init_np = np.asarray(rf)[:n_cells, :k]
    rf_np = np.asarray(final_usages)[:n_cells, :k]
    spectra_tpm_np = np.asarray(spectra_tpm)[:k]
    XtX_np = np.asarray(XtX, dtype=np.float64)[:k, :k]
    XtY_np = np.asarray(XtY, dtype=np.float64)[:k]
    usage_coef, *_ = np.linalg.lstsq(XtX_np, XtY_np, rcond=None)
    return (density_np, labels_np, median_np, rf_init_np, rf_np,
            spectra_tpm_np, usage_coef)
