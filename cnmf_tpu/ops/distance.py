"""Pairwise distances and KNN local-density filtering on device.

Replaces sklearn's ``euclidean_distances`` + ``np.argpartition`` KNN density
estimate (reference cnmf.py:891-898): the R×R spectra distance matrix
(R = n_iter·K) is one gram-trick matmul on the MXU, and the mean distance to
the n nearest neighbors comes from iterative min-extraction — a tiny,
shape-stable program (sort/top_k would recompile per neighbor count, and TPU
sort compiles are expensive).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

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


def _sum_smallest(dist: jax.Array, count: jax.Array) -> jax.Array:
    """Per-row sum of the ``count`` smallest entries via iterative min
    extraction. O(count·R²) VPU work but a tiny, shape-stable program —
    chosen over sort/top_k, whose TPU compiles are expensive and would rerun
    for every distinct neighbor count (count is a traced scalar here)."""
    def body(i, carry):
        total, d = carry
        m = jnp.min(d, axis=1)
        total = total + m
        is_min = d == m[:, None]
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1
        d = jnp.where(is_min & first, jnp.inf, d)
        return total, d

    total0 = jnp.zeros(dist.shape[0], dist.dtype)
    total, _ = jax.lax.fori_loop(0, count, body, (total0, dist))
    return total




def _knn_density_body(Xp: jax.Array, n_real: jax.Array, n_neighbors: jax.Array):
    """Traceable KNN-density body — shared by the standalone jitted program
    below and the fused consensus program (ops/consensus_fused traces it
    inline), so the density semantics cannot diverge between the two."""
    dist = pairwise_euclidean(Xp)
    # mask padded columns out of every neighborhood
    col_real = jnp.arange(Xp.shape[0]) < n_real
    dist = jnp.where(col_real[None, :], dist, jnp.inf)
    total = _sum_smallest(dist, n_neighbors + 1)
    return total / n_neighbors.astype(dist.dtype)


_knn_density_padded = jax.jit(_knn_density_body)


def local_density_from_spectra(l2_spectra, n_neighbors: int):
    """Distance + KNN density for L2-normalized spectra stacks; returns a
    host (R,) array.

    The row count is padded to a multiple of 512 so the compiled program is
    reused across K values (R = n_iter·K changes with K). The pad, the
    scalar operands and the final row slice stay on the HOST: done eagerly
    with jnp they each compile their own tiny XLA program (_pad /
    convert_element_type / dynamic_slice — ~1.2 s of cold compiles through
    axon's remote compiler for an 8 MB pad and a row slice)."""
    arr = np.asarray(l2_spectra)
    R = arr.shape[0]
    pad = (-R) % 512
    Xp = np.pad(arr, ((0, pad), (0, 0))) if pad else arr
    dens = _knn_density_padded(Xp, np.int32(R), np.int32(n_neighbors))
    return np.asarray(dens)[:R]
