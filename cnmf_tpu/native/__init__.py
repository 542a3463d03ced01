"""Native (C++/OpenMP) host kernels, loaded via ctypes.

The compute path is JAX/XLA/Pallas on device; these cover the host-bound
pieces that feed it — currently the CSR→dense expansion of multi-GB counts /
TPM matrices (scipy's ``.toarray()`` is single-threaded; rows expand
independently, so this threads linearly).

The shared library builds on first use with g++ (cached beside the source);
every entry point falls back to scipy/numpy when no compiler is available, so
the package works without a native toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
import scipy.sparse as sp

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "densify.cpp")
_LIB_PATH = os.path.join(_HERE, "_densify.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    # compile to a private temp path and atomically rename so concurrent
    # processes never load a half-written .so
    tmp_path = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", tmp_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, _LIB_PATH)
        return True
    except Exception:
        # no compiler / failed build → scipy fallback
        try:
            os.remove(tmp_path)
        except OSError:
            pass
        return False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            stale = not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            )
        except OSError:
            stale = not os.path.exists(_LIB_PATH)
        if stale:
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind_symbols(lib)
        except (OSError, AttributeError):
            # AttributeError: a prebuilt .so whose mtime post-dates the source
            # (cp -p / rsync -a checkout, clock skew) but was compiled from
            # older source missing newer symbols — rebuild once, then give up
            # to the numpy fallback
            lib = None
            if _build():
                try:
                    lib = ctypes.CDLL(_LIB_PATH)
                    _bind_symbols(lib)
                except (OSError, AttributeError):
                    lib = None
            if lib is None:
                _lib_failed = True
                return None
        _lib = lib
        return _lib


def _bind_symbols(lib) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    # every kernel exists for int32 and int64 stored-index dtypes (scipy
    # promotes indices to int64 at nnz >= 2^31); the _i64 suffix selects
    for suffix, idx_p in [("", i32p), ("_i64", i64p)]:
        for name, data_t in [
            ("densify_csr_f32", ctypes.c_float),
            ("densify_csr_f64", ctypes.c_double),
        ]:
            fn = getattr(lib, name + suffix)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(data_t), idx_p, i64p,
                ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(data_t),
            ]
        fn = getattr(lib, "densify_csr_f64_to_f32" + suffix)
        fn.restype = None
        fn.argtypes = [
            f64p, idx_p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        for name, data_t in [
            ("csr_col_moments_f64", ctypes.c_double),
            ("csr_col_moments_f32", ctypes.c_float),
        ]:
            fn = getattr(lib, name + suffix)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(data_t), idx_p,
                ctypes.c_int64, ctypes.c_int64, f64p, f64p,
            ]
        fn = getattr(lib, "csr_col_subset_count" + suffix)
        fn.restype = ctypes.c_int64
        fn.argtypes = [idx_p, ctypes.c_int64, i32p]
        # fill outputs indices at the INPUT index dtype (uniform scipy dtype,
        # no post-hoc recast over nnz-length arrays)
        for name, data_t in [
            ("csr_col_subset_fill_f64", ctypes.c_double),
            ("csr_col_subset_fill_f32", ctypes.c_float),
        ]:
            fn = getattr(lib, name + suffix)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(data_t), idx_p, i64p, ctypes.c_int64,
                i32p, ctypes.POINTER(data_t), idx_p, i64p,
            ]


def csr_col_moments(X):
    """Per-column (sum, sum of squares) over the nonzeros of a CSR matrix,
    one threaded pass. Returns None when the native library is unavailable
    or the matrix layout/dtype isn't covered (caller falls back to numpy)."""
    if not sp.isspmatrix_csr(X) or X.dtype not in (np.float64, np.float32):
        return None
    if X.indices.dtype not in (np.int32, np.int64):
        return None
    lib = _load()
    if lib is None:
        return None
    suffix = "_i64" if X.indices.dtype == np.int64 else ""
    idx_t = ctypes.c_int64 if suffix else ctypes.c_int32
    data = np.ascontiguousarray(X.data)
    indices = np.ascontiguousarray(X.indices)
    s = np.zeros(X.shape[1], dtype=np.float64)
    q = np.zeros(X.shape[1], dtype=np.float64)
    fn = getattr(
        lib,
        ("csr_col_moments_f64" if X.dtype == np.float64
         else "csr_col_moments_f32") + suffix,
    )
    data_t = ctypes.c_double if X.dtype == np.float64 else ctypes.c_float
    fn(
        data.ctypes.data_as(ctypes.POINTER(data_t)),
        indices.ctypes.data_as(ctypes.POINTER(idx_t)),
        np.int64(data.size), np.int64(X.shape[1]),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return s, q


def csr_col_subset(X, lookup):
    """Column-subset a CSR matrix through a gather table (``lookup[j]`` =
    output column of input column j, -1 = drop) in two streaming passes.
    Returns ``(data, indices, indptr)`` arrays, or None when the native
    library is unavailable or the layout isn't covered (caller falls back
    to the numpy path)."""
    if not sp.isspmatrix_csr(X) or X.dtype not in (np.float64, np.float32):
        return None
    if X.indices.dtype not in (np.int32, np.int64):
        return None
    lib = _load()
    if lib is None:
        return None
    suffix = "_i64" if X.indices.dtype == np.int64 else ""
    idx_t = ctypes.c_int64 if suffix else ctypes.c_int32
    idx_p = ctypes.POINTER(idx_t)
    data = np.ascontiguousarray(X.data)
    indices = np.ascontiguousarray(X.indices)
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    lookup = np.ascontiguousarray(lookup, dtype=np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    kept = getattr(lib, "csr_col_subset_count" + suffix)(
        indices.ctypes.data_as(idx_p), np.int64(data.size),
        lookup.ctypes.data_as(i32),
    )
    out_data = np.empty(kept, dtype=X.dtype)
    # keep the input's index dtype: uniform scipy index arrays, no recast
    out_indices = np.empty(kept, dtype=X.indices.dtype)
    out_indptr = np.empty(X.shape[0] + 1, dtype=np.int64)
    data_t = ctypes.c_double if X.dtype == np.float64 else ctypes.c_float
    fn = getattr(
        lib,
        ("csr_col_subset_fill_f64" if X.dtype == np.float64
         else "csr_col_subset_fill_f32") + suffix,
    )
    fn(
        data.ctypes.data_as(ctypes.POINTER(data_t)),
        indices.ctypes.data_as(idx_p),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int64(X.shape[0]),
        lookup.ctypes.data_as(i32),
        out_data.ctypes.data_as(ctypes.POINTER(data_t)),
        out_indices.ctypes.data_as(idx_p),
        out_indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_data, out_indices, out_indptr


def densify_csr(X, out_dtype=None) -> np.ndarray:
    """CSR → C-contiguous dense, threaded. Falls back to scipy when no
    native library is available. ``out_dtype`` optionally casts during
    expansion (f64 data → f32 dense without an intermediate)."""
    if not sp.issparse(X):
        arr = np.asarray(X)
        if out_dtype is not None:
            arr = arr.astype(out_dtype, copy=False)
        return arr
    Xc = X.tocsr()
    out_dtype = np.dtype(out_dtype) if out_dtype is not None else Xc.dtype

    lib = _load()
    n_rows, n_cols = Xc.shape
    # stream indices at their stored dtype — recasting int64 indices at
    # >2.1B nnz would materialize an 8+ GB temp on a slow-first-touch host
    if Xc.indices.dtype in (np.int32, np.int64):
        indices = np.ascontiguousarray(Xc.indices)
    else:
        indices = np.ascontiguousarray(Xc.indices, dtype=np.int32)
    suffix = "_i64" if indices.dtype == np.int64 else ""
    idx_p = ctypes.POINTER(
        ctypes.c_int64 if suffix else ctypes.c_int32
    )
    indptr = np.ascontiguousarray(Xc.indptr, dtype=np.int64)

    if lib is not None:
        out = np.empty((n_rows, n_cols), dtype=out_dtype)
        ip = indices.ctypes.data_as(idx_p)
        i64 = indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if Xc.dtype == np.float64 and out_dtype == np.float32:
            data = np.ascontiguousarray(Xc.data)
            getattr(lib, "densify_csr_f64_to_f32" + suffix)(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ip, i64, n_rows, n_cols,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out
        if out_dtype == np.float32:
            data = np.ascontiguousarray(Xc.data, dtype=np.float32)
            getattr(lib, "densify_csr_f32" + suffix)(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ip, i64, n_rows, n_cols,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out
        if out_dtype == np.float64:
            data = np.ascontiguousarray(Xc.data, dtype=np.float64)
            getattr(lib, "densify_csr_f64" + suffix)(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ip, i64, n_rows, n_cols,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return out

    # scipy fallback (or unusual dtype)
    return Xc.toarray().astype(out_dtype, copy=False)
