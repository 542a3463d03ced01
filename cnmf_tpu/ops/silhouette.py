"""Euclidean silhouette score on device.

Replaces sklearn's ``silhouette_score`` (reference cnmf.py:923) for the
K-selection stability metric. Works from the full pairwise distance matrix:
a(i) = mean intra-cluster distance, b(i) = min mean distance to another
cluster, s(i) = (b-a)/max(a,b); singleton clusters score 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.nmf import MATMUL_PRECISION

from cnmf_tpu.ops.distance import pairwise_euclidean


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def silhouette_from_distances(dist: jax.Array, labels: jax.Array, n_clusters: int) -> jax.Array:
    n = dist.shape[0]
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=dist.dtype)  # (n, k)
    counts = jnp.sum(onehot, axis=0)  # (k,)
    # sum of distances from each point to each cluster: (n, k)
    dist_to_cluster = jnp.dot(dist, onehot, preferred_element_type=dist.dtype, precision=MATMUL_PRECISION)

    own_count = counts[labels]
    own_sum = jnp.take_along_axis(dist_to_cluster, labels[:, None], axis=1)[:, 0]
    a = own_sum / jnp.maximum(own_count - 1.0, 1.0)

    mean_other = dist_to_cluster / jnp.maximum(counts[None, :], 1.0)
    own_mask = onehot > 0
    empty_mask = (counts == 0)[None, :]
    mean_other = jnp.where(own_mask | empty_mask, jnp.inf, mean_other)
    b = jnp.min(mean_other, axis=1)

    s = (b - a) / jnp.maximum(jnp.maximum(a, b), jnp.finfo(dist.dtype).tiny)
    s = jnp.where(own_count <= 1, 0.0, s)  # singleton clusters score 0
    return jnp.mean(s)


def silhouette_score(X, labels, n_clusters: int) -> float:
    dist = pairwise_euclidean(jnp.asarray(X))
    return float(silhouette_from_distances(dist, jnp.asarray(labels), n_clusters))


@functools.partial(jax.jit, static_argnames=("n_cluster_pad",))
def _silhouette_padded(Xp, labels_p, n_real, n_cluster_pad: int):
    """Silhouette on row-padded data: padded points carry zero weight (they
    contribute to no cluster and are excluded from the mean), padded cluster
    slots are empty and masked like any empty cluster."""
    Rp = Xp.shape[0]
    w = (jnp.arange(Rp) < n_real).astype(Xp.dtype)
    dist = pairwise_euclidean(Xp)

    onehot = jax.nn.one_hot(labels_p, n_cluster_pad, dtype=dist.dtype) * w[:, None]
    counts = jnp.sum(onehot, axis=0)
    dist_to_cluster = jnp.dot(dist, onehot, preferred_element_type=dist.dtype,
                              precision=MATMUL_PRECISION)

    own_count = counts[labels_p]
    own_sum = jnp.take_along_axis(dist_to_cluster, labels_p[:, None], axis=1)[:, 0]
    a = own_sum / jnp.maximum(own_count - 1.0, 1.0)

    mean_other = dist_to_cluster / jnp.maximum(counts[None, :], 1.0)
    own_mask = jax.nn.one_hot(labels_p, n_cluster_pad, dtype=jnp.bool_)
    empty_mask = (counts == 0)[None, :]
    mean_other = jnp.where(own_mask | empty_mask, jnp.inf, mean_other)
    b = jnp.min(mean_other, axis=1)

    s = (b - a) / jnp.maximum(jnp.maximum(a, b), jnp.finfo(dist.dtype).tiny)
    s = jnp.where(own_count <= 1, 0.0, s) * w
    return jnp.sum(s) / n_real.astype(dist.dtype)


def silhouette_score_padded(X, labels, n_clusters: int,
                            pad_points_to: int = 512,
                            pad_clusters_to: int = 8) -> float:
    """Silhouette with shape bucketing so a K-selection sweep reuses one
    compiled program per (R-bucket, K-bucket) instead of per (R, k)."""
    X = np.asarray(X)
    R = X.shape[0]
    Rp = -(-R // pad_points_to) * pad_points_to
    Kp = -(-n_clusters // pad_clusters_to) * pad_clusters_to
    Xp = np.zeros((Rp, X.shape[1]), dtype=X.dtype)
    Xp[:R] = X
    lp = np.zeros(Rp, dtype=np.int32)
    lp[:R] = np.asarray(labels)
    return float(_silhouette_padded(
        Xp, lp, np.int32(R), Kp
    ))
