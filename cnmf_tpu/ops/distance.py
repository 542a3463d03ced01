"""Pairwise distances and KNN local-density filtering on device.

Replaces sklearn's ``euclidean_distances`` + ``np.argpartition`` KNN density
estimate (reference cnmf.py:891-898): the R×R spectra distance matrix
(R = n_iter·K) is one gram-trick matmul on the MXU, and the mean distance to
the n nearest neighbors uses ``lax.top_k`` on negated distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cnmf_tpu.ops.nmf import MATMUL_PRECISION


@jax.jit
def pairwise_euclidean(A: jax.Array, B: jax.Array = None) -> jax.Array:
    """sqrt(max(‖a‖² + ‖b‖² − 2a·b, 0)) — sklearn euclidean_distances semantics.

    When B is None the self-distance diagonal is forced to exactly 0.
    """
    self_dist = B is None
    if B is None:
        B = A
    a2 = jnp.sum(A * A, axis=1)[:, None]
    b2 = jnp.sum(B * B, axis=1)[None, :]
    ab = jnp.dot(A, B.T, preferred_element_type=A.dtype, precision=MATMUL_PRECISION)
    d2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    if self_dist:
        d2 = d2 * (1.0 - jnp.eye(A.shape[0], dtype=A.dtype))
    return jnp.sqrt(d2)


@functools.partial(jax.jit, static_argnames=("n_neighbors",))
def knn_local_density(dist: jax.Array, n_neighbors: int) -> jax.Array:
    """Mean distance to the n nearest neighbors per row.

    Matches the reference's estimator (cnmf.py:893-898): take the
    ``n_neighbors+1`` smallest distances per row (self included at distance 0)
    and divide their sum by ``n_neighbors``.
    """
    neg_topk, _ = jax.lax.top_k(-dist, n_neighbors + 1)
    return -jnp.sum(neg_topk, axis=1) / n_neighbors


@functools.partial(jax.jit, static_argnames=("n_neighbors",))
def local_density_from_spectra(l2_spectra: jax.Array, n_neighbors: int) -> jax.Array:
    """Fused distance + KNN density for L2-normalized spectra stacks."""
    dist = pairwise_euclidean(l2_spectra)
    return knn_local_density(dist, n_neighbors)
