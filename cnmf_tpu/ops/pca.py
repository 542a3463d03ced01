"""PCA on device.

Replaces ``sc.pp.pca(zero_center=True)`` (reference preprocess.py:330) for the
Harmony embedding. Centered SVD with sklearn's svd_flip sign convention so
components are deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_comps",))
def _pca_svd(X: jax.Array, n_comps: int):
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    # svd_flip (u_based): make the largest-|u| entry of each column positive
    max_idx = jnp.argmax(jnp.abs(U), axis=0)
    signs = jnp.sign(U[max_idx, jnp.arange(U.shape[1])])
    U = U * signs[None, :]
    pcs = U[:, :n_comps] * S[None, :n_comps]
    components = (Vt[:n_comps] * signs[:n_comps, None])
    explained_var = (S**2) / (X.shape[0] - 1)
    return pcs, components, explained_var[:n_comps]


def pca(X, n_comps: int = 50):
    """Returns (cell_embeddings (N, n_comps), components (n_comps, G),
    explained_variance)."""
    X = np.asarray(X, dtype=np.float32) if not isinstance(X, jax.Array) else X
    n_comps = min(n_comps, min(X.shape) - 1)
    pcs, comps, ev = _pca_svd(jnp.asarray(X), n_comps)
    return np.asarray(pcs), np.asarray(comps), np.asarray(ev)
