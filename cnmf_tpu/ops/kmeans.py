"""KMeans: host kmeans++ seeding + batched Lloyd iterations on device.

Replaces sklearn's ``KMeans(k, n_init=10, random_state=1)`` (reference
cnmf.py:908-910). The ``n_init`` restarts run as one vmapped device program;
kmeans++ seeding stays on host (sequential, RNG-driven, O(R·k) — trivial next
to the batched Lloyd matmuls) and follows sklearn's greedy n_local_trials
scheme so cluster quality matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.nmf import MATMUL_PRECISION


def _kmeans_plusplus(X: np.ndarray, n_clusters: int, rng: np.random.RandomState):
    """Greedy kmeans++ (sklearn _kmeans_plusplus semantics, uniform weights)."""
    n_samples = X.shape[0]
    n_local_trials = 2 + int(np.log(n_clusters))
    x_sq = np.einsum("ij,ij->i", X, X)

    centers = np.empty((n_clusters, X.shape[1]), dtype=X.dtype)
    center_id = rng.randint(n_samples)
    centers[0] = X[center_id]

    def sq_dist_to(points):
        # ||x - p||² via the gram trick, clipped at 0
        p_sq = np.einsum("ij,ij->i", points, points)
        d2 = x_sq[None, :] + p_sq[:, None] - 2.0 * points @ X.T
        return np.maximum(d2, 0.0)

    closest = sq_dist_to(centers[0:1])[0]
    current_pot = closest.sum()

    for c in range(1, n_clusters):
        rand_vals = rng.uniform(size=n_local_trials) * current_pot
        candidate_ids = np.searchsorted(np.cumsum(closest), rand_vals)
        np.clip(candidate_ids, None, n_samples - 1, out=candidate_ids)

        dist_to_cand = sq_dist_to(X[candidate_ids])
        np.minimum(closest[None, :], dist_to_cand, out=dist_to_cand)
        candidates_pot = dist_to_cand.sum(axis=1)

        best = int(np.argmin(candidates_pot))
        current_pot = candidates_pot[best]
        closest = dist_to_cand[best]
        centers[c] = X[candidate_ids[best]]

    return centers


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lloyd_batched(X: jax.Array, centers0: jax.Array, tol: jax.Array,
                   n_points: jax.Array, n_clusters: jax.Array, max_iter: int):
    """Run Lloyd iterations for a batch of inits on padded inputs.

    X: (Rp, D) with zero rows past ``n_points``; centers0: (I, Kp, D) with
    far-away sentinel rows past ``n_clusters``; tol: scalar (already scaled
    by mean var). Padded points carry zero weight and padded clusters are
    masked to +inf distance, so results are exactly the unpadded ones — the
    padding exists so every (R, k) configuration in a K-selection sweep maps
    onto a handful of compiled programs.
    Returns (labels (I, Rp), inertia (I,), centers (I, Kp, D)).
    """
    Rp = X.shape[0]
    Kp = centers0.shape[1]
    x_sq = jnp.sum(X * X, axis=1)
    w = (jnp.arange(Rp) < n_points).astype(X.dtype)       # point weights
    col_real = jnp.arange(Kp) < n_clusters                # real clusters

    def assign(centers):
        c_sq = jnp.sum(centers * centers, axis=1)
        d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * jnp.dot(
            X, centers.T, preferred_element_type=X.dtype, precision=MATMUL_PRECISION
        )
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(col_real[None, :], d2, jnp.inf)
        labels = jnp.argmin(d2, axis=1)
        min_d2 = jnp.min(d2, axis=1) * w
        return labels, min_d2

    def update(labels, min_d2, centers):
        onehot = jax.nn.one_hot(labels, Kp, dtype=X.dtype) * w[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.dot(onehot.T, X, preferred_element_type=X.dtype, precision=MATMUL_PRECISION)

        # relocate empty (real) clusters to the points farthest from their
        # centers (sklearn _relocate_empty_clusters semantics: the point's
        # weight MOVES — it is subtracted from its source cluster); padded
        # points sort last
        order = jnp.argsort(-jnp.where(w > 0, min_d2, -jnp.inf))

        def relocate(i, carry):
            sums, counts, n_used = carry
            far_idx = order[n_used]
            # guard: never relocate onto a padded (zero-weight) point — can
            # occur only in degenerate n_points < n_clusters configurations
            empty = jnp.logical_and(
                jnp.logical_and(counts[i] == 0, col_real[i]),
                w[far_idx] > 0,
            )
            src = labels[far_idx]  # never == i: cluster i is empty
            moved_sums = sums.at[src].add(-X[far_idx]).at[i].set(X[far_idx])
            moved_counts = counts.at[src].add(-1.0).at[i].set(1.0)
            sums = jnp.where(empty, moved_sums, sums)
            counts = jnp.where(empty, moved_counts, counts)
            return sums, counts, n_used + jnp.where(empty, 1, 0)

        sums, counts, _ = jax.lax.fori_loop(
            0, Kp, relocate, (sums, counts, jnp.zeros((), jnp.int32))
        )
        safe_counts = jnp.where(counts == 0, 1.0, counts)
        new_centers = sums / safe_counts[:, None]
        # keep padded clusters at their far-away sentinel
        return jnp.where(col_real[:, None], new_centers, centers)

    def one_init(centers0):
        def cond(state):
            it, done, *_ = state
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def body(state):
            it, done, centers, _, _ = state
            labels, min_d2 = assign(centers)
            new_centers = update(labels, min_d2, centers)
            shift = jnp.sum(
                jnp.where(col_real[:, None], (new_centers - centers) ** 2, 0.0)
            )
            return it + 1, shift <= tol, new_centers, labels, jnp.sum(min_d2)

        labels0, min_d2_0 = assign(centers0)
        state = (
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
            centers0, labels0, jnp.sum(min_d2_0),
        )
        _, _, centers, _, _ = jax.lax.while_loop(cond, body, state)
        # final assignment with converged centers (sklearn returns labels of
        # the last full assignment against the final centers)
        labels, min_d2 = assign(centers)
        return labels, jnp.sum(min_d2), centers

    return jax.vmap(one_init)(centers0)


# distance of the padded-cluster sentinel: far enough that no real point can
# win its argmin, small enough that squaring stays finite in float32
_PAD_SENTINEL = 1e15


def kmeans_fit(
    X: np.ndarray,
    n_clusters: int,
    n_init: int = 10,
    random_state: int = 1,
    max_iter: int = 300,
    tol: float = 1e-4,
    pad_points_to: int = 512,
    pad_clusters_to: int = 8,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Full KMeans fit: returns (labels, centers, inertia) of the best init.

    Inputs are zero/sentinel-padded to shape buckets (exact no-op, see
    _lloyd_batched) so K-selection sweeps reuse compiled programs.
    """
    X = np.ascontiguousarray(X)
    R, D = X.shape
    if R < n_clusters:
        raise ValueError(
            f"n_samples={R} should be >= n_clusters={n_clusters}"
        )
    rng = np.random.RandomState(random_state)
    centers0 = np.stack(
        [_kmeans_plusplus(X, n_clusters, rng) for _ in range(n_init)]
    )
    # sklearn scales tol by the mean per-feature variance of X
    scaled_tol = tol * float(np.mean(np.var(X, axis=0)))

    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-n_clusters // pad_clusters_to) * pad_clusters_to
    Xp = np.zeros((Rp, D), dtype=X.dtype)
    Xp[:R] = X
    c0 = np.full((n_init, Kp, D), _PAD_SENTINEL, dtype=X.dtype)
    c0[:, :n_clusters] = centers0

    labels, inertia, centers = _lloyd_batched(
        Xp, c0,
        np.asarray(scaled_tol, dtype=X.dtype),
        np.int32(R), np.int32(n_clusters),
        max_iter,
    )
    best = int(np.argmin(np.asarray(inertia)))
    return (
        np.asarray(labels[best][:R]),
        np.asarray(centers[best][:n_clusters]),
        float(inertia[best]),
    )
