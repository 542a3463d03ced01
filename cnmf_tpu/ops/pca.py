"""PCA on device.

Replaces ``sc.pp.pca(zero_center=True)`` (reference preprocess.py:330) for the
Harmony embedding, with sklearn's u-based ``svd_flip`` sign convention so
components are deterministic.

Implementation: eigendecomposition of the smaller Gram matrix rather than a
direct SVD of the centered data. TPU's iterative SVD of a tall 100k×2000
matrix computes all 2000 singular triplets and measured several hundred
seconds; the Gram route is one MXU matmul (the (G,G) or (N,N) product) plus
an eigh of the small square — the same top-``n_comps`` subspace at PCA-level
accuracy (the embedding feeds Harmony's soft clustering, and the squared
condition number of z-scored expression data is far from f32 limits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.nmf import MATMUL_PRECISION


@functools.partial(jax.jit, static_argnames=("n_comps",))
def _pca_gram_features(X: jax.Array, n_comps: int):
    """N >= G: eigh of the (G, G) feature Gram."""
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    G = jnp.dot(Xc.T, Xc, preferred_element_type=Xc.dtype,
                precision=MATMUL_PRECISION)
    evals, V = jnp.linalg.eigh(G)  # ascending
    evals = jnp.maximum(evals[::-1], 0.0)
    V = V[:, ::-1]
    Vk = V[:, :n_comps]
    US = jnp.dot(Xc, Vk, preferred_element_type=Xc.dtype,
                 precision=MATMUL_PRECISION)  # = U * S, (N, k)
    # svd_flip (u_based): largest-|u| entry of each U column made positive;
    # a null direction (zero US column, rank-deficient input) keeps sign +1
    # so its component row stays unit-norm instead of zeroing out
    max_idx = jnp.argmax(jnp.abs(US), axis=0)
    signs = jnp.sign(US[max_idx, jnp.arange(n_comps)])
    signs = jnp.where(signs == 0, 1.0, signs)
    pcs = US * signs[None, :]
    components = (Vk * signs[None, :]).T
    explained_var = evals[:n_comps] / (X.shape[0] - 1)
    return pcs, components, explained_var


@functools.partial(jax.jit, static_argnames=("n_comps",))
def _pca_gram_rows(X: jax.Array, n_comps: int):
    """N < G: eigh of the (N, N) row Gram (U lives there directly)."""
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    G = jnp.dot(Xc, Xc.T, preferred_element_type=Xc.dtype,
                precision=MATMUL_PRECISION)
    evals, U = jnp.linalg.eigh(G)
    evals = jnp.maximum(evals[::-1], 0.0)
    U = U[:, ::-1]
    S = jnp.sqrt(evals[:n_comps])
    Uk = U[:, :n_comps]
    max_idx = jnp.argmax(jnp.abs(Uk), axis=0)
    signs = jnp.sign(Uk[max_idx, jnp.arange(n_comps)])
    signs = jnp.where(signs == 0, 1.0, signs)
    Uk = Uk * signs[None, :]
    pcs = Uk * S[None, :]
    components = jnp.dot(Uk.T, Xc,
                         preferred_element_type=Xc.dtype,
                         precision=MATMUL_PRECISION)
    # Vᵀ = S⁻¹UᵀXc has unit rows; renormalizing (instead of dividing by a
    # guarded S) enforces that exactly AND gives null directions a unit-norm
    # row — the same convention the feature-Gram branch produces, so
    # rank-deficient results no longer depend on the N-vs-G shape
    row_norms = jnp.linalg.norm(components, axis=1, keepdims=True)
    components = components / jnp.maximum(row_norms, jnp.finfo(Xc.dtype).tiny)
    explained_var = evals[:n_comps] / (X.shape[0] - 1)
    return pcs, components, explained_var


def pca(X, n_comps: int = 50):
    """Returns (cell_embeddings (N, n_comps), components (n_comps, G),
    explained_variance)."""
    X = np.asarray(X, dtype=np.float32) if not isinstance(X, jax.Array) else X
    n_comps = min(n_comps, min(X.shape) - 1)
    fn = _pca_gram_features if X.shape[0] >= X.shape[1] else _pca_gram_rows
    pcs, comps, ev = fn(jnp.asarray(X), n_comps)
    return np.asarray(pcs), np.asarray(comps), np.asarray(ev)
