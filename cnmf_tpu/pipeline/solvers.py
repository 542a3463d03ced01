"""Solver dispatch: sklearn-style NMF kwargs → batched device kernels.

The pipeline persists one YAML kwargs dict per run (same keys as the
reference's sklearn kwargs, cnmf.py:618-631) and every stage reconstructs its
solver from it. This module maps that dict onto the JAX kernels in
``cnmf_tpu.ops.nmf``.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.init import nnls_w_init
from cnmf_tpu.ops.nmf import (
    nmf_coordinate_descent,
    nmf_coordinate_descent_compacted,
    nmf_multiplicative_update,
)

BETA_LOSS = {"frobenius": 2.0, "kullback-leibler": 1.0, "itakura-saito": 0.0}


def beta_loss_to_float(beta_loss) -> float:
    if isinstance(beta_loss, str):
        return BETA_LOSS[beta_loss]
    return float(beta_loss)


def compute_regularization(
    alpha_W: float, alpha_H, l1_ratio: float, shape
) -> Tuple[float, float, float, float]:
    """sklearn _compute_regularization scaling: W-regs scale with n_features,
    H-regs with n_samples."""
    n_samples, n_features = shape
    if alpha_H == "same" or alpha_H is None:
        alpha_H = alpha_W
    l1_reg_W = n_features * alpha_W * l1_ratio
    l1_reg_H = n_samples * alpha_H * l1_ratio
    l2_reg_W = n_features * alpha_W * (1.0 - l1_ratio)
    l2_reg_H = n_samples * alpha_H * (1.0 - l1_ratio)
    return float(l1_reg_W), float(l1_reg_H), float(l2_reg_W), float(l2_reg_H)


def mu_pallas_eligible(beta: float, dtype) -> bool:
    """Whether the fused Pallas MU kernels apply (TPU backend, f32, beta≠2,
    not opted out) — the same gate solve_nmf_batch uses."""
    return (
        beta != 2.0
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and os.environ.get("CNMF_TPU_PALLAS", "1") == "1"
    )


def solve_nmf_batch(
    X: jax.Array,
    W0: jax.Array,
    Ht0: jax.Array,
    nmf_kwargs: dict,
    update_H: bool = True,
    mu_chunk: int = 8,
    compact: bool = False,
    allow_pallas: bool = True,
) -> Tuple[jax.Array, jax.Array, np.ndarray]:
    """Run the batched solver described by sklearn-style kwargs.

    X: (N, G); W0: (B, N, K); Ht0: (B, G, K). Returns (W, Ht, n_iter).
    ``compact``: drop converged restarts from the batch between 125-sweep
    segments (CD only) — saves the tail cost of slow-converging restarts.
    """
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    solver = nmf_kwargs.get("solver", "cd")
    tol = float(nmf_kwargs.get("tol", 1e-4))
    max_iter = int(nmf_kwargs.get("max_iter", 200))
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    if solver == "cd":
        if beta != 2.0:
            raise ValueError("CD solver supports frobenius loss only")
        if compact:
            return nmf_coordinate_descent_compacted(
                X, np.asarray(W0), np.asarray(Ht0), tol=tol, max_iter=max_iter,
                update_H=update_H,
                l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            )
        return nmf_coordinate_descent(
            X, W0, Ht0, tol=tol, max_iter=max_iter, update_H=update_H,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        )
    # Fused Pallas kernels keep the N×G reconstruction in VMEM for the
    # beta != 2 losses on TPU (the XLA path materializes it in HBM chunk by
    # chunk). Disabled under the sharded mesh path — pallas_call has no GSPMD
    # partitioning rule.
    use_pallas = allow_pallas and mu_pallas_eligible(beta, jnp.asarray(W0).dtype)
    return nmf_multiplicative_update(
        X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter, update_H=update_H,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H, chunk=mu_chunk,
        use_pallas=use_pallas,
    )


def refit_usages(
    X,
    spectra: np.ndarray,
    nmf_kwargs: dict,
    dtype=np.float32,
    mu_chunk: int = 8,
) -> np.ndarray:
    """Fixed-spectra NNLS usage refit (sklearn update_H=False semantics):
    W init zeros for CD, sqrt(X.mean()/K) for MU (reference cnmf.py:776-802).

    ``X`` may be a host array or an already-device-resident jax array —
    consensus reuses one device copy across its three refits to avoid
    re-uploading the full-gene TPM matrix."""
    solver = nmf_kwargs.get("solver", "cd")
    k = spectra.shape[0]
    # zero-pad the component count to a bucket of 8 so refits across a K
    # sweep share one compiled program (exact no-op for both solvers; the MU
    # avg-init on padded components is irrelevant — their spectra rows are 0
    # so their usage converges to 0 and is sliced away)
    pad_k = -(-k // 8) * 8
    spectra_p = np.ascontiguousarray(spectra.T, dtype=dtype)
    if pad_k > k:
        spectra_p = np.pad(spectra_p, ((0, 0), (0, pad_k - k)))
    if isinstance(X, jax.Array):
        Xd = X.astype(dtype) if X.dtype != dtype else X
        if solver == "mu":
            avg = float(jnp.sqrt(jnp.mean(Xd) / k))
            W0 = jnp.full((1, Xd.shape[0], pad_k), avg, dtype=dtype)
        else:
            W0 = jnp.zeros((1, Xd.shape[0], pad_k), dtype=dtype)
    else:
        Xd = jnp.asarray(np.ascontiguousarray(X, dtype=dtype))
        W0 = jnp.asarray(
            np.pad(nnls_w_init(X, k, solver, dtype=dtype),
                   ((0, 0), (0, pad_k - k)),
                   mode="edge" if solver == "mu" else "constant")[None]
        )
    Ht0 = jnp.asarray(spectra_p[None])
    W, _, _ = solve_nmf_batch(
        Xd, W0, Ht0, nmf_kwargs, update_H=False, mu_chunk=mu_chunk
    )
    return np.asarray(W[0, :, :k])
