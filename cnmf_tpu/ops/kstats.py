"""Fused K-selection stats: one device program per K.

The reference's k_selection_plot re-runs the consensus stats path per K
(reference cnmf.py:1119-1135 → 823-936): KMeans over the merged spectra,
cluster-median consensus spectra, an NNLS usage refit, a silhouette score and
a Frobenius prediction error. Run separately those are ~5 device dispatches
and ~5 host↔device synchronization points per K; through a remote/relayed
TPU each synchronization is a chance to queue behind other work.

Here the whole chain after the host kmeans++ seeding is ONE jitted program
(Lloyd iterations → best-init labels → per-cluster medians → row renorm →
fixed-spectra NNLS → silhouette → row-chunked SSE) that returns two scalars.
Shapes are bucketed exactly like the stand-alone kernels (points padded to
512s, clusters to 8s) so a K=5..13 sweep reuses a handful of compiled
programs, and the scalars are returned as device arrays so the sweep can
dispatch every K before fetching any result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.kmeans import _kmeans_plusplus, _lloyd_batched, _PAD_SENTINEL
from cnmf_tpu.ops.nmf import (
    nmf_coordinate_descent,
    nmf_multiplicative_update,
    nnls_cd_fixed_spectra,
    reconstruction_sse,
)
from cnmf_tpu.ops.silhouette import _silhouette_padded


def _cluster_medians(Xp: jax.Array, labels: jax.Array, valid: jax.Array,
                     n_clusters: jax.Array, n_cluster_pad: int) -> jax.Array:
    """Per-cluster column medians of the valid rows of ``Xp`` (pandas
    ``groupby().median()`` semantics: mean of the two central order
    statistics for even counts). Runs as a lax.map over cluster slots so only
    one (Rp, D) sort buffer is live at a time. Empty / padded cluster slots
    return all-zero rows."""

    def one_cluster(c):
        in_c = valid & (labels == c) & (c < n_clusters)
        cnt = jnp.sum(in_c.astype(jnp.int32))
        vals = jnp.where(in_c[:, None], Xp, jnp.inf)
        svals = jnp.sort(vals, axis=0)
        lo = jnp.maximum((cnt - 1) // 2, 0)
        hi = jnp.maximum(cnt // 2, 0)
        m = 0.5 * (
            jax.lax.dynamic_index_in_dim(svals, lo, axis=0, keepdims=False)
            + jax.lax.dynamic_index_in_dim(svals, hi, axis=0, keepdims=False)
        )
        return jnp.where(cnt > 0, m, jnp.zeros_like(m))

    return jax.lax.map(one_cluster, jnp.arange(n_cluster_pad))


def _k_stats_chain(
    Xnc: jax.Array,            # (N, G) normalized counts, device-resident
    Xp: jax.Array,             # (Rp, G) zero-padded L2-normalized spectra
    centers0: jax.Array,       # (n_init, Kp, G) sentinel-padded kmeans++ seeds
    lloyd_tol: jax.Array,      # scalar, pre-scaled by mean feature variance
    n_points: jax.Array,       # scalar int32: real spectra rows
    n_clusters: jax.Array,     # scalar int32: real k
    n_cells: jax.Array,        # scalar int32: real Xnc rows (≤ N when padded)
    *,
    n_cluster_pad: int,
    lloyd_max_iter: int,
    solver: str,
    beta: float,
    refit_tol: float,
    refit_max_iter: int,
    l1_reg_W: float,
    l2_reg_W: float,
    mu_chunk: int,
    use_pallas: bool,
):
    """Everything after the kmeans++ seeding — shared by the host-seeded
    program and the device-seeded (spectra-twin) program below."""
    Rp = Xp.shape[0]
    labels_all, inertia, _ = _lloyd_batched(
        Xp, centers0, lloyd_tol, n_points, n_clusters, lloyd_max_iter
    )
    best = jnp.argmin(inertia)
    labels = labels_all[best]
    valid = jnp.arange(Rp) < n_points

    median = _cluster_medians(Xp, labels, valid, n_clusters, n_cluster_pad)
    rowsum = jnp.sum(median, axis=1, keepdims=True)
    median_n = jnp.where(
        rowsum > 0, median / jnp.where(rowsum == 0, 1.0, rowsum), 0.0
    )

    # fixed-spectra NNLS usage refit (reference cnmf.py:918-920); padded
    # cluster slots have all-zero spectra so their usage columns stay 0 and
    # the SSE below is exactly the unpadded one. Likewise cell-padded Xnc
    # rows (even mesh sharding, parallel.mesh.put_cells) keep their W rows
    # pinned at 0 — CD inits at 0, MU gets a row-masked init and a mean over
    # the real elements — so the silhouette/SSE scalars are exactly the
    # unpadded ones.
    N = Xnc.shape[0]
    Ht0 = jnp.transpose(median_n)[None].astype(Xnc.dtype)
    if solver == "cd":
        W0 = jnp.zeros((1, N, n_cluster_pad), Xnc.dtype)
        if use_pallas:
            W, _, _ = nmf_coordinate_descent(
                Xnc, W0, Ht0, tol=refit_tol, max_iter=refit_max_iter,
                update_H=False, l1_reg_W=l1_reg_W, l2_reg_W=l2_reg_W,
                use_pallas=True,
            )
        else:
            # fixed spectra → products-distilled refit (exact same
            # sweeps/factors, see ops.nmf.nnls_cd_fixed_spectra)
            W, _ = nnls_cd_fixed_spectra(
                Xnc, Ht0, W0, tol=refit_tol, max_iter=refit_max_iter,
                l1_reg=l1_reg_W, l2_reg=l2_reg_W,
            )
    else:
        # multiply AFTER the float cast: n_cells is a traced int32 scalar and
        # n_cells * G wraps negative past 2^31 elements (1M cells x 2k+ HVGs)
        n_elem = jnp.asarray(n_cells).astype(Xnc.dtype) * Xnc.shape[1]
        avg = jnp.sqrt(jnp.sum(Xnc) / n_elem / n_clusters.astype(Xnc.dtype))
        W0 = jnp.full((1, N, n_cluster_pad), avg, Xnc.dtype)
        cellmask = jnp.arange(N) < n_cells
        W0 = W0 * cellmask[None, :, None].astype(Xnc.dtype)
        W, _, _ = nmf_multiplicative_update(
            Xnc, W0, Ht0, beta=beta, tol=refit_tol, max_iter=refit_max_iter,
            update_H=False, l1_reg_W=l1_reg_W, l2_reg_W=l2_reg_W,
            chunk=mu_chunk, use_pallas=use_pallas,
        )

    silhouette = _silhouette_padded(Xp, labels, n_points, n_cluster_pad)
    sse = reconstruction_sse(Xnc, W[0], median_n.astype(Xnc.dtype))
    return silhouette, sse


_fused_k_stats = functools.partial(
    jax.jit,
    static_argnames=(
        "n_cluster_pad", "lloyd_max_iter", "solver", "beta",
        "refit_tol", "refit_max_iter", "l1_reg_W", "l2_reg_W",
        "mu_chunk", "use_pallas",
    ),
)(_k_stats_chain)


@functools.partial(
    jax.jit,
    static_argnames=(
        "r_pad", "n_cluster_pad", "n_init", "n_local_trials",
        "lloyd_max_iter", "solver", "beta", "refit_tol", "refit_max_iter",
        "l1_reg_W", "l2_reg_W", "mu_chunk", "use_pallas", "lloyd_tol",
    ),
)
def _fused_k_stats_dev(
    Xnc: jax.Array,            # (N, G) normalized counts, device-resident
    raw: jax.Array,            # (R, G) RAW merged spectra (device twin)
    key: jax.Array,            # (2,) uint32 threefry key words
    n_clusters: jax.Array,     # scalar int32: real k
    n_cells: jax.Array,        # scalar int32: real Xnc rows
    *,
    r_pad: int,
    n_cluster_pad: int,
    n_init: int,
    n_local_trials: int,
    lloyd_max_iter: int,
    lloyd_tol: float,
    solver: str,
    beta: float,
    refit_tol: float,
    refit_max_iter: int,
    l1_reg_W: float,
    l2_reg_W: float,
    mu_chunk: int,
    use_pallas: bool,
):
    """K-stats fed by the DEVICE-RESIDENT raw merged spectra a same-process
    factorize left behind (CNMF_TPU_DEVICE_SPECTRA): the L2 row
    normalization, the point-bucket zero-pad, the Lloyd tolerance scaling
    and the greedy kmeans++ seeding (threefry-keyed device variant, see
    ops/consensus_fused._device_kmeanspp) all run inside the program — no
    spectra bytes cross the link for the whole K-selection sweep."""
    from cnmf_tpu.ops.consensus_fused import (
        _l2_normalize_pad,
        _seed_kmeanspp_batch,
    )

    dtype = raw.dtype
    R = raw.shape[0]
    Xp = _l2_normalize_pad(raw, r_pad)
    l2 = Xp[:R]
    # host twin: lloyd_tol * np.mean(np.var(X, axis=0)) over the REAL rows
    mean = jnp.mean(l2, axis=0, keepdims=True)
    scaled_tol = lloyd_tol * jnp.mean(jnp.mean((l2 - mean) ** 2, axis=0))

    n_points = jnp.int32(R)
    w = (jnp.arange(r_pad) < n_points).astype(dtype)
    centers0 = _seed_kmeanspp_batch(
        Xp, w, n_points, n_clusters, key, n_init=n_init,
        n_cluster_pad=n_cluster_pad, n_local_trials=n_local_trials,
    )

    return _k_stats_chain(
        Xnc, Xp, centers0, scaled_tol.astype(dtype),
        n_points, n_clusters, n_cells,
        n_cluster_pad=n_cluster_pad, lloyd_max_iter=lloyd_max_iter,
        solver=solver, beta=beta, refit_tol=refit_tol,
        refit_max_iter=refit_max_iter, l1_reg_W=l1_reg_W,
        l2_reg_W=l2_reg_W, mu_chunk=mu_chunk, use_pallas=use_pallas,
    )


def consensus_k_stats_device(
    Xnc: jax.Array,
    raw_spectra: jax.Array,
    k: int,
    *,
    solver: str = "cd",
    beta: float = 2.0,
    refit_tol: float = 1e-4,
    refit_max_iter: int = 200,
    l1_reg_W: float = 0.0,
    l2_reg_W: float = 0.0,
    n_init: int = 10,
    random_state: int = 1,
    lloyd_max_iter: int = 300,
    lloyd_tol: float = 1e-4,
    pad_points_to: int = 512,
    pad_clusters_to: int = 8,
    use_pallas: bool = False,
    n_cells: int = None,
):
    """``consensus_k_stats`` for a device-resident RAW spectra twin: one
    dispatch, nothing but the key crosses the link. Seeding is the
    threefry device kmeans++ (same greedy n_local_trials scheme as the
    numpy-seeded host path — SURVEY §2.10-sanctioned RNG swap, identical
    partitions on real data, see tests/test_device_kmeanspp.py)."""
    R = raw_spectra.shape[0]
    if R < k:
        raise ValueError(f"n_samples={R} should be >= n_clusters={k}")
    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-k // pad_clusters_to) * pad_clusters_to
    # key words built on host — an eager jax.random.PRNGKey would dispatch
    # its own tiny seeding program through the relay
    seed = int(random_state)
    key = np.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                   dtype=np.uint32)
    n_cells = Xnc.shape[0] if n_cells is None else int(n_cells)
    return _fused_k_stats_dev(
        Xnc, raw_spectra, key,
        np.int32(k), np.int32(n_cells),
        r_pad=Rp, n_cluster_pad=Kp, n_init=int(n_init),
        n_local_trials=2 + int(np.log(k)),
        lloyd_max_iter=lloyd_max_iter, lloyd_tol=float(lloyd_tol),
        solver=solver, beta=float(beta),
        refit_tol=float(refit_tol), refit_max_iter=int(refit_max_iter),
        l1_reg_W=float(l1_reg_W), l2_reg_W=float(l2_reg_W),
        mu_chunk=8, use_pallas=use_pallas,
    )


def consensus_k_stats(
    Xnc: jax.Array,
    l2_spectra: np.ndarray,
    k: int,
    *,
    solver: str = "cd",
    beta: float = 2.0,
    refit_tol: float = 1e-4,
    refit_max_iter: int = 200,
    l1_reg_W: float = 0.0,
    l2_reg_W: float = 0.0,
    n_init: int = 10,
    random_state: int = 1,
    lloyd_max_iter: int = 300,
    lloyd_tol: float = 1e-4,
    pad_points_to: int = 512,
    pad_clusters_to: int = 8,
    use_pallas: bool = False,
    n_cells: int = None,
):
    """Dispatch the fused stats program for one K; returns device scalars
    ``(silhouette, prediction_error)`` — call ``float()`` on them to block.

    Solver config arrives as plain scalars (the pipeline layer translates
    sklearn-style kwargs dicts — see cNMF._dispatch_k_stats). Host side only
    runs the sklearn-style greedy kmeans++ seeding (same RNG scheme as
    ops.kmeans.kmeans_fit, so labels match the stand-alone path).
    """
    X = np.ascontiguousarray(l2_spectra)
    R, D = X.shape
    if R < k:
        raise ValueError(f"n_samples={R} should be >= n_clusters={k}")
    rng = np.random.RandomState(random_state)
    centers0 = np.stack([_kmeans_plusplus(X, k, rng) for _ in range(n_init)])
    scaled_tol = lloyd_tol * float(np.mean(np.var(X, axis=0)))

    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-k // pad_clusters_to) * pad_clusters_to
    Xpad = np.zeros((Rp, D), dtype=X.dtype)
    Xpad[:R] = X
    c0 = np.full((n_init, Kp, D), _PAD_SENTINEL, dtype=X.dtype)
    c0[:, :k] = centers0

    n_cells = Xnc.shape[0] if n_cells is None else int(n_cells)
    return _fused_k_stats(
        Xnc, Xpad, c0,
        np.asarray(scaled_tol, dtype=X.dtype),
        np.int32(R), np.int32(k),
        np.int32(n_cells),
        n_cluster_pad=Kp, lloyd_max_iter=lloyd_max_iter,
        solver=solver, beta=float(beta),
        refit_tol=float(refit_tol),
        refit_max_iter=int(refit_max_iter),
        l1_reg_W=float(l1_reg_W), l2_reg_W=float(l2_reg_W),
        mu_chunk=8, use_pallas=use_pallas,
    )
