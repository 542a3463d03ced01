#!/usr/bin/env python
"""End-to-end validation ABOVE the int64-CSR line (VERDICT round-3 item 8).

scipy promotes CSR index arrays to int64 once nnz exceeds 2^31-1; the native
kernels and loaders branch on that dtype. tests/test_int64_csr.py pins the
dtype branches on small matrices; this script runs a REAL over-the-line
matrix — ~2.156 B nnz (1.1 M cells x 30 k genes, 1960 nnz/row) — through
prepare -> factorize once, to close the "untested beyond that line" edge
(TODO.md). Results recorded in extras/ATLAS_RESULTS.md.

Generation is streamed into preallocated CSR arrays (a 25 GB working set;
the host has 125 GB). Values are synthetic int-ish gammas; the validation
target is the DATA PLUMBING (int64 indices through moments/subset/densify/
h5ad/solver input derivation), not recovery quality.

Usage: python extras/int64_line_check.py [--small]  (--small: below-line
sanity run of the same code path, ~1/100 size)
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

os.environ.setdefault("CNMF_TPU_MATMUL_PRECISION", "high")
os.environ.setdefault("CNMF_TPU_PREPARE_DTYPE", "float32")
os.environ.setdefault("CNMF_TPU_ASYNC_WRITES", "1")
os.environ.setdefault("CNMF_TPU_TIMINGS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[int64check +{time.perf_counter() - T0:7.1f}s] {msg}",
          flush=True)


T0 = time.perf_counter()


def make_csr(n_rows: int, n_cols: int, nnz_per_row: int, seed: int = 7):
    """Streamed synthetic counts CSR: strided unique sorted column pattern
    per row (stride chosen so no wraparound), gamma-ish integer values."""
    stride = n_cols // nnz_per_row
    assert stride >= 2 and (nnz_per_row - 1) * stride + stride - 1 < n_cols
    nnz = n_rows * nnz_per_row
    idx_dtype = np.int64 if nnz > np.iinfo(np.int32).max else np.int32
    log(f"allocating nnz={nnz:,} ({idx_dtype.__name__} indices)")
    data = np.empty(nnz, dtype=np.float32)
    indices = np.empty(nnz, dtype=idx_dtype)
    indptr = np.arange(0, nnz + nnz_per_row, nnz_per_row, dtype=np.int64)
    base = (np.arange(nnz_per_row, dtype=idx_dtype) * stride)
    rng = np.random.RandomState(seed)
    block = max(1, 20_000_000 // nnz_per_row)  # ~20M nnz per fill chunk
    for r0 in range(0, n_rows, block):
        r1 = min(r0 + block, n_rows)
        rows = np.arange(r0, r1, dtype=idx_dtype)
        # per-row phase keeps rows distinct; columns stay sorted + unique
        cols = base[None, :] + (rows % stride)[:, None]
        sl = slice(r0 * nnz_per_row, r1 * nnz_per_row)
        indices[sl] = cols.ravel()
        vals = rng.gamma(1.2, 2.0, size=(r1 - r0) * nnz_per_row)
        data[sl] = np.floor(vals).astype(np.float32) + 1.0  # >=1: no 0 rows
        if (r0 // block) % 10 == 0:
            log(f"  filled rows {r1:,}/{n_rows:,}")
    X = sp.csr_matrix((data, indices, indptr), shape=(n_rows, n_cols))
    X.has_canonical_format = True
    log(f"CSR built: {X.shape}, nnz={X.nnz:,}, "
        f"indices dtype={X.indices.dtype}, indptr dtype={X.indptr.dtype}")
    return X


def main():
    small = "--small" in sys.argv
    if small:
        n_rows, n_cols, nnz_per_row = 11_000, 3_000, 196
    else:
        n_rows, n_cols, nnz_per_row = 1_100_000, 30_000, 1960

    import pandas as pd

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from cnmf_tpu import cNMF
    from cnmf_tpu.io.anndata_lite import AnnData
    from cnmf_tpu.io.h5ad import write_h5ad

    workdir = os.environ.get("INT64_CHECK_DIR", "/tmp/int64_check")
    os.makedirs(workdir, exist_ok=True)

    X = make_csr(n_rows, n_cols, nnz_per_row)
    over_line = X.nnz > np.iinfo(np.int32).max
    log(f"over the int32 line: {over_line}")
    if not small:
        assert over_line, "configuration must exceed 2^31-1 nnz"
        assert X.indices.dtype == np.int64

    ad = AnnData(
        X=X,
        obs=pd.DataFrame(index=[f"c{i}" for i in range(n_rows)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(n_cols)]),
    )
    counts_fn = os.path.join(workdir, "counts.h5ad")
    t = time.perf_counter()
    write_h5ad(counts_fn, ad)
    log(f"counts h5ad written in {time.perf_counter() - t:.1f}s "
        f"({os.path.getsize(counts_fn) / 1e9:.1f} GB)")
    del ad, X

    obj = cNMF(output_dir=workdir, name="i64")
    t = time.perf_counter()
    obj.prepare(counts_fn=counts_fn, components=[5], n_iter=2, seed=14,
                num_highvar_genes=500, max_NMF_iter=60)
    log(f"prepare: {time.perf_counter() - t:.1f}s")

    t = time.perf_counter()
    obj.factorize(verbose=True)
    log(f"factorize: {time.perf_counter() - t:.1f}s")
    obj.flush_writes()

    from cnmf_tpu.io.dataframe import load_df_from_npz
    for it in range(2):
        spec = load_df_from_npz(obj.paths["iter_spectra"] % (5, it))
        assert spec.shape == (5, 500)
        assert np.isfinite(spec.values).all() and (spec.values >= 0).all()
    log("factorize artifacts finite/nonnegative — int64 line check PASSED")


if __name__ == "__main__":
    main()
