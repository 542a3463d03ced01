"""Batched OLS of (optionally z-scored) targets on usages.

Replaces the reference's chunked-on-CPU ``efficient_ols_all_cols``
(reference cnmf.py:55-125): Beta = (UᵀU)⁻¹ Uᵀ Z where Z is the per-column
z-scored TPM matrix. On device the XtX/XtY accumulation is a pair of matmuls
over gene chunks (the full-gene axis can exceed HBM comfort at atlas scale);
the final K×K solve runs on host with numpy's lstsq (LAPACK gelsd) to match
the reference's rcond=None semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cnmf_tpu.ops.nmf import MATMUL_PRECISION
import scipy.sparse as sp

from cnmf_tpu.ops.stats import mean_var

# nnz per accumulation block of the sparse-host UᵀY product: bounds the
# per-block f64 cast to ~200 MB so it recycles the warm malloc arena
# instead of faulting one matrix-sized fresh allocation (tests shrink it
# to force the multi-block path)
SPMM_BLOCK_NNZ = 25_000_000


@jax.jit
def _xty_zscored(U: jax.Array, Y: jax.Array, mean: jax.Array, inv_std: jax.Array):
    """Uᵀ · ((Y - mean)·inv_std) without materializing the normalized Y:
    UᵀY·inv_std − (Uᵀ1)·(mean·inv_std)."""
    uty = jnp.dot(U.T, Y, preferred_element_type=U.dtype, precision=MATMUL_PRECISION)
    u_sum = jnp.sum(U, axis=0)
    return (uty - u_sum[:, None] * mean[None, :]) * inv_std[None, :]


def efficient_ols_all_cols(
    U: np.ndarray,
    Y,
    batch_size: int = 16384,
    normalize_y: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """OLS coefficients (n_predictors × n_targets) of Y columns on U.

    U: (N, K) dense usages. Y: (N, G) targets — a device-resident jax array
    (consensus's normal path: one matmul) or a host dense/sparse matrix, in
    which case XtY accumulates over ROW batches like the reference
    (cnmf.py:101-119) so only a (batch × G) tile densifies at a time. With
    ``normalize_y``, Y columns are globally z-scored (var floored at 1e-12,
    reference cnmf.py:89-95) — folded into the matmul rather than
    materialized.
    """
    n, k = U.shape
    if isinstance(Y, jax.Array) and Y.shape[0] > n:
        # Y is cell-padded for even mesh sharding (parallel.mesh.put_cells):
        # zero-pad U to match — zero rows add nothing to UᵀY/Uᵀ1, and the
        # mean/variance reductions below divide by the REAL row count n
        U = np.pad(np.asarray(U), ((0, Y.shape[0] - n), (0, 0)))
    elif Y.shape[0] != n:
        raise ValueError("U and Y must have the same number of rows.")
    U = np.ascontiguousarray(U, dtype=dtype)

    if normalize_y:
        if isinstance(Y, jax.Array):
            # two-pass variance: E[(Y-mean)²] — the one-pass E[Y²]-mean² form
            # catastrophically cancels in f32 for high-mean/low-variance TPM
            # columns (measured ~36% beta error on mean≈1e3, std≈1 genes).
            # Column-chunked so the centered intermediate stays ≤ ~800 MB
            # in BYTES (×2 the itemsize budget at float64, the CPU/x64 test
            # configuration) — at atlas scale Y itself already fills half of HBM
            gchunk = max(1, int(8e8 // max(Y.shape[0] * Y.dtype.itemsize, 1)))
            rowmask = (jnp.arange(Y.shape[0]) < n)[:, None]
            means, vars = [], []
            for s in range(0, Y.shape[1], gchunk):
                Ys = Y[:, s:s + gchunk]
                m = jnp.sum(Ys, axis=0) / n
                means.append(m)
                centered = jnp.where(rowmask, Ys - m[None, :], 0.0)
                vars.append(jnp.sum(jnp.square(centered), axis=0) / n)
            mean_d = jnp.concatenate(means)
            var_d = jnp.concatenate(vars)
            mean_y = np.asarray(mean_d, dtype=np.float64)
            var_y = np.asarray(var_d, dtype=np.float64)
        else:
            mean_y, var_y = mean_var(Y)
        var_y = np.maximum(var_y, 1e-12)
        inv_std = (1.0 / np.sqrt(var_y)).astype(dtype)
        # full-precision mean for the host-sparse branch below — the
        # cancellation-prone XtY − (Uᵀ1)·mean correction must not re-inject
        # a compute-dtype rounding of the mean
        mean_y64 = np.asarray(mean_y, dtype=np.float64)
        mean_y = mean_y.astype(dtype)

    XtX = (U[:n].T @ U[:n]).astype(np.float64)
    Ud = jnp.asarray(U)
    _ysh = getattr(Y, "sharding", None)
    if isinstance(_ysh, NamedSharding) and tuple(_ysh.spec)[:1] not in ((), (None,)):
        # co-shard U's rows with Y's so the UᵀY contraction psums over the
        # mesh instead of all-gathering Y
        Ud = jax.device_put(
            Ud, NamedSharding(_ysh.mesh, P(tuple(_ysh.spec)[0], None))
        )

    if isinstance(Y, jax.Array):
        Yd = Y.astype(dtype) if Y.dtype != dtype else Y
        if normalize_y:
            XtY = np.asarray(
                _xty_zscored(Ud, Yd, jnp.asarray(mean_y), jnp.asarray(inv_std)),
                dtype=np.float64,
            )
        else:
            XtY = np.asarray(
                jnp.dot(Ud.T, Yd, preferred_element_type=Ud.dtype,
                        precision=MATMUL_PRECISION),
                dtype=np.float64,
            )
    elif sp.issparse(Y):
        # sparse host matrix: UᵀY is a host SpMM (O(nnz·k)) — the
        # row-batched device path below would upload the dense row tiles
        # (~9 GB at the 100k×20k atlas config through a ~32 MB/s link).
        # f64 throughout: strictly tighter than the device f32 accumulation.
        # The product accumulates over ROW BLOCKS: a whole-matrix Y.T @ U64
        # makes scipy upcast-copy every nonzero to f64 in one fresh ~2 GB
        # allocation (measured 33 s on a slow-first-touch host); per-block
        # casts reuse the same warm arena (~2 s). Blocks are zero-copy
        # views into Y's arrays — only the cast copies.
        U64 = U[:n].astype(np.float64)
        Yr = Y.tocsr()
        XtY = np.zeros((k, Y.shape[1]), dtype=np.float64)
        r0 = 0
        while r0 < Yr.shape[0]:
            # bound each block by ACTUAL nnz, not mean density — depth-skewed
            # matrices (cells sorted by library size) would otherwise blow
            # the ~200 MB per-block cast this loop exists to enforce
            r1 = int(np.searchsorted(
                Yr.indptr, int(Yr.indptr[r0]) + SPMM_BLOCK_NNZ, side="right"
            )) - 1
            r1 = min(max(r1, r0 + 1), Yr.shape[0])
            p0, p1 = int(Yr.indptr[r0]), int(Yr.indptr[r1])
            block = sp.csr_matrix(
                (
                    Yr.data[p0:p1].astype(np.float64),
                    Yr.indices[p0:p1],
                    Yr.indptr[r0:r1 + 1] - p0,
                ),
                shape=(r1 - r0, Yr.shape[1]), copy=False,
            )
            XtY += np.asarray((block.T @ U64[r0:r1])).T
            r0 = r1
        if normalize_y:
            u_sum = U64.sum(axis=0)
            XtY = (XtY - u_sum[:, None] * mean_y64[None, :]) \
                * (1.0 / np.sqrt(var_y))[None, :]
    else:
        # host fallback: row-batched accumulation bounds memory at
        # batch_size × G regardless of N
        g = Y.shape[1]
        mean_d = jnp.asarray(mean_y) if normalize_y else None
        inv_d = jnp.asarray(inv_std) if normalize_y else None
        XtY_acc = jnp.zeros((k, g), dtype=dtype)
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            Yb = Y[start:end]
            if sp.issparse(Yb):
                Yb = Yb.toarray()
            Yb = jnp.asarray(np.ascontiguousarray(Yb, dtype=dtype))
            Ub = Ud[start:end]
            if normalize_y:
                XtY_acc = XtY_acc + _xty_zscored(Ub, Yb, mean_d, inv_d)
            else:
                XtY_acc = XtY_acc + jnp.dot(
                    Ub.T, Yb, preferred_element_type=dtype,
                    precision=MATMUL_PRECISION,
                )
        XtY = np.asarray(XtY_acc, dtype=np.float64)

    beta, *_ = np.linalg.lstsq(XtX, XtY, rcond=None)
    return beta
