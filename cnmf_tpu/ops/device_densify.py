"""Sparse host→device transfer: ship CSR components, densify on device.

The pipeline's device programs all want a dense cells × genes matrix in HBM,
but at atlas scale the dense form is an order of magnitude larger than the
CSR it came from (the 100k×20k validation config is 8 GB dense vs ~0.85 GB
as data+indices at ~5% fill). Through a host→device link measured at
~32 MB/s (CLAUDE.md relay numbers) — and on any real machine where PCIe/DCN
feeding the chip is the data-loading bottleneck — transferring the sparse
triplet and expanding it on device turns a ~250 s upload into a ~30 s one.

The expansion itself is one scatter-add into a zero matrix: row ids are
recovered from ``indptr`` with a vectorized ``searchsorted`` (no host-side
row-index materialization, which would itself be nnz×4 bytes), and the nnz
axis is padded to a bucket so repeated uploads of similarly sized matrices
reuse one compiled program. Padded entries carry ``data == 0`` aimed at
(0, 0) — an exact no-op under scatter-ADD. Canonical CSR has no duplicate
coordinates, so the scatter touches every real element exactly once and the
result is bit-identical to a host-side densify of the same cast data.

Replaces nothing in the reference (it never moves data to an accelerator);
this is the TPU-native answer to its in-memory scipy CSR handling
(reference cnmf.py:19-20, 405-406).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

# nnz padding granularity: big enough that one compiled program covers a
# family of similarly-sized matrices, small enough that the padded transfer
# overhead stays <3% for anything atlas-sized
_NNZ_BUCKET = 1 << 22

# above this, the scatter runs in nnz blocks against a DONATED accumulator:
# the one-shot program's live set (dense output + data/cols/iota/row-ids +
# the scatter's combined index tuples, ~6 × nnz × 4 B) plus an 8 GB dense
# no longer fits HBM at atlas scale (measured RESOURCE_EXHAUSTED at 242M nnz
# on a 16 GB v5e; the blocked form peaks at dense + ~6 × block × 4 B)
_SINGLE_SHOT_MAX_NNZ = 1 << 26
_BLOCK_NNZ = 1 << 25


@functools.partial(jax.jit, static_argnames=("n_rows", "n_cols"))
def _scatter_csr(data, cols, indptr, n_rows: int, n_cols: int):
    nnz = data.shape[0]
    # position i belongs to the row r with indptr[r] <= i < indptr[r+1];
    # padded positions (i >= indptr[-1]) land past the last row and are
    # dropped by the scatter (their data is 0 regardless)
    rows = (
        jnp.searchsorted(indptr, jnp.arange(nnz, dtype=jnp.int32), side="right")
        - 1
    )
    dense = jnp.zeros((n_rows, n_cols), dtype=data.dtype)
    # canonical CSR → (row, col) pairs are row-major sorted; the zero-data
    # pad tail repeats (n_rows, 0), which keeps the order non-decreasing
    return dense.at[rows, cols].add(
        data, mode="drop", indices_are_sorted=True
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_csr_block(dense, data, cols, indptr, i0):
    """Scatter one nnz block into the donated accumulator. ``i0`` is the
    block's global nnz offset; row ids come from the FULL indptr, so blocks
    need not align to row boundaries. Padded positions (global index past
    indptr[-1]) resolve past the last row and are dropped (data 0 anyway)."""
    i = jnp.arange(data.shape[0], dtype=jnp.int32) + i0
    rows = jnp.searchsorted(indptr, i, side="right") - 1
    return dense.at[rows, cols].add(
        data, mode="drop", indices_are_sorted=True
    )


def device_densify_eligible(X, out_dtype, n_devices: int = 1) -> bool:
    """True when shipping ``X`` sparse and scattering on device beats the
    dense upload: sparse input, a lone accelerator device (the sharded
    consensus path wants host-padded cell shards), indices in int32 range,
    and the CSR bytes actually under the dense bytes."""
    if not sp.issparse(X):
        return False
    if os.environ.get("CNMF_TPU_DEVICE_DENSIFY", "1") != "1":
        return False
    if n_devices != 1 or jax.default_backend() not in ("tpu",):
        return False
    if X.nnz >= 2**31 - _NNZ_BUCKET or max(X.shape) >= 2**31:
        return False
    sparse_bytes = X.nnz * (np.dtype(out_dtype).itemsize + 4)
    dense_bytes = X.shape[0] * X.shape[1] * np.dtype(out_dtype).itemsize
    return sparse_bytes < 0.5 * dense_bytes


def device_densify_csr(X, out_dtype=np.float32):
    """Dense device array from a scipy sparse matrix, transferring only the
    CSR components. Exactly equals ``jnp.asarray(X.toarray().astype(...))``
    (same element placement, no summation: canonical CSR has one entry per
    coordinate)."""
    Xc = X.tocsr() if not sp.isspmatrix_csr(X) else X
    if not Xc.has_canonical_format:
        Xc = Xc.copy()
        Xc.sum_duplicates()
    nnz = Xc.nnz
    if nnz >= 2**31 or max(Xc.shape) >= 2**31:
        raise ValueError(
            f"device_densify_csr needs int32-addressable input "
            f"(nnz={nnz}, shape={Xc.shape}); route through the sparse "
            f"host path instead (device_densify_eligible gates this)")
    data = Xc.data.astype(out_dtype, copy=False)
    cols = Xc.indices.astype(np.int32, copy=False)
    indptr = Xc.indptr.astype(np.int32, copy=False)

    if nnz <= _SINGLE_SHOT_MAX_NNZ:
        pad = (-nnz) % _NNZ_BUCKET
        if pad:
            data = np.concatenate([data, np.zeros(pad, dtype=data.dtype)])
            cols = np.concatenate([cols, np.zeros(pad, dtype=np.int32)])
        return _scatter_csr(
            jnp.asarray(data), jnp.asarray(cols), jnp.asarray(indptr),
            int(Xc.shape[0]), int(Xc.shape[1]),
        )

    # atlas path: stream nnz blocks into a donated accumulator so the peak
    # live set is the dense output plus ONE block's transfer/index temps
    dense = jnp.zeros(Xc.shape, dtype=out_dtype)
    indptr_d = jnp.asarray(indptr)
    for start in range(0, nnz, _BLOCK_NNZ):
        stop = min(start + _BLOCK_NNZ, nnz)
        d_blk = data[start:stop]
        c_blk = cols[start:stop]
        if stop - start < _BLOCK_NNZ:
            pad = _BLOCK_NNZ - (stop - start)
            d_blk = np.concatenate([d_blk, np.zeros(pad, dtype=d_blk.dtype)])
            c_blk = np.concatenate([c_blk, np.zeros(pad, dtype=np.int32)])
        dense = _scatter_csr_block(
            dense, jnp.asarray(d_blk), jnp.asarray(c_blk), indptr_d,
            jnp.asarray(start, jnp.int32),
        )
    return dense
