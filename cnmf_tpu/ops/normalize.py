"""Row/column normalization kernels.

TPM (per-cell library-size) normalization and unit-variance gene scaling,
replacing the reference's scanpy calls (``sc.pp.normalize_total`` at
cnmf.py:250 and ``sc.pp.scale(zero_center=False)`` at cnmf.py:538). Host-side (numpy/scipy, sparse-aware) — at O(nnz) single-pass
cost these stay on host; the device-resident compute paths normalize inline.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def normalize_total(X, target_sum: float = 1e6):
    """Scale each row (cell) to sum to ``target_sum``. Returns a new matrix.

    Float inputs keep their dtype (scanpy ``pp.normalize_total`` semantics:
    an f32 counts matrix yields an f32 TPM); integer counts widen to f64.
    Dtype preservation matters at atlas scale — upcasting a 242M-nnz TPM
    to f64 costs a 1.9 GB cast and doubles the h5ad bytes on a ~40 MB/s
    sustained disk."""
    if sp.issparse(X):
        totals = np.asarray(X.sum(axis=1)).ravel().astype(np.float64)
        scale = np.divide(
            target_sum, totals, out=np.zeros_like(totals, dtype=np.float64),
            where=totals != 0,
        )
        out_dtype = X.dtype if X.dtype.kind == "f" else np.float64
        # scale CSR rows in place on a fresh DATA array — only data mutates,
        # so the output can share the source's indices/indptr instead of
        # duplicating ~1 GB of index structure at atlas scale (a
        # diag @ X spgemm is ~100x slower still at 1e8 nnz). Sharing is
        # only safe when neither side can later canonicalize in place
        # (sort_indices/sum_duplicates reorder indices against the OTHER
        # matrix's data) — so share exactly when the source is already
        # canonical, making those calls no-ops on both.
        Xc = X.tocsr()
        if Xc.has_canonical_format:
            out = sp.csr_matrix(
                (Xc.data.astype(out_dtype), Xc.indices, Xc.indptr),
                shape=Xc.shape, copy=False,
            )
            out.has_canonical_format = True
        else:
            out = sp.csr_matrix(
                (Xc.data.astype(out_dtype), Xc.indices.copy(),
                 Xc.indptr.copy()),
                shape=Xc.shape, copy=False,
            )
        scale = scale.astype(out_dtype)
        try:
            from scipy.sparse import _sparsetools
            _sparsetools.csr_scale_rows(
                out.shape[0], out.shape[1], out.indptr, out.indices,
                out.data, scale,
            )
        except (ImportError, AttributeError):
            out.data *= np.repeat(scale, np.diff(out.indptr))
        return out
    X = np.asarray(X)
    out_dtype = X.dtype if X.dtype.kind == "f" else np.float64
    totals = X.sum(axis=1, keepdims=True, dtype=np.float64)
    safe = np.where(totals == 0, 1.0, totals)
    # ONE fused cast+scale pass: the ufunc casts integer input blocks on
    # the fly, so only the output is allocated. A separate astype would
    # first-touch a full extra copy — 216 MB at the PBMC bench shape on a
    # host where fresh GB-scale pages fault at 60-180 MB/s in degraded
    # windows (measured as prepare's dominant variance term). Values are
    # bit-identical to cast-then-multiply. The output lands in a reused
    # warm arena buffer (utils/arena) — same fresh-page motivation,
    # measured as 2-3x inflation on repeat same-process prepares.
    from cnmf_tpu.utils.arena import host_arena

    out = host_arena.take(X.shape, out_dtype)
    return np.multiply(X, (target_sum / safe).astype(np.float64),
                       dtype=out_dtype, out=out)




def scale_unit_variance(X, ddof: int = 1, zero_safe: bool = True,
                        return_std: bool = False, inplace: bool = False):
    """Divide each column by its std (no centering).

    ``zero_safe`` maps std==0 → 1 (scanpy pp.scale semantics used on the
    reference's sparse path, cnmf.py:538); the dense reference path divides
    unguarded (cnmf.py:542) — pass zero_safe=False to reproduce it.

    ``return_std`` returns ``(scaled, std)`` with the RAW (pre-guard) std —
    the divisor before any zero_safe mapping — so callers that need the
    per-column std again (prepare's device-norm stash) skip a second full
    pass over the matrix.

    ``inplace`` (dense float input only) divides into X itself instead of
    allocating the quotient — prepare hands an arena-backed cast buffer so
    the whole norm stage touches no fresh GB-scale pages. Bit-identical to
    the out-of-place divide.
    """
    if sp.issparse(X):
        n = X.shape[0]
        mean = np.asarray(X.mean(axis=0)).ravel()
        sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
        var = (sq - mean**2) * n / max(n - ddof, 1)
        std = np.sqrt(var)
        raw_std = std.copy()
        if zero_safe:
            std[std == 0] = 1.0
        inv = (np.divide(1.0, std, out=np.zeros_like(std), where=std != 0)
               if not zero_safe else 1.0 / std)
        # scale CSR columns in place on a copy (see normalize_total: the
        # X @ diag spgemm is the slow general path)
        out = X.tocsr().astype(np.result_type(X.dtype, inv.dtype))
        if out is X:
            out = out.copy()
        try:
            from scipy.sparse import _sparsetools
            _sparsetools.csr_scale_columns(
                out.shape[0], out.shape[1], out.indptr, out.indices,
                out.data, inv,
            )
        except (ImportError, AttributeError):
            out.data *= inv[out.indices]
        return (out, raw_std) if return_std else out
    X = np.asarray(X)
    std = X.std(axis=0, ddof=ddof)
    raw_std = std
    if zero_safe:
        std = np.where(std == 0, 1.0, std)
    if inplace and X.dtype.kind == "f":
        out = np.divide(X, std, out=X)
    else:
        out = X / std
    return (out, raw_std) if return_std else out


