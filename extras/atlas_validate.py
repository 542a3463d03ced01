#!/usr/bin/env python
"""Atlas-scale validation: 100k cells × 20k genes, end-to-end on one chip.

Synthesizes a planted-program sparse count matrix (~5% fill, ~100M nnz, the
scale of a large organ atlas), then drives prepare → factorize → combine →
consensus and prints per-stage wall times. This is the configuration TODO.md
tracks for the 1M-cell story; the interesting costs are the sparse→device
transfers (ops/device_densify) and the fused consensus chain over the
full-gene TPM.

Usage: python extras/atlas_validate.py [--cells N] [--genes G] [--n-iter I]
       (defaults 100000 × 20000, K=12 × 30 restarts, consensus at K=12)

The synthesized counts are cached under --scratch (default /tmp) keyed by
shape, so re-runs skip the ~minutes-long host synthesis.
"""

import argparse
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synthesize(n_cells, n_genes, k_true=12, seed=11, block=2000,
               h_density=0.08):
    """Planted-program sparse counts, built block-of-cells at a time so the
    dense Poisson rate tile stays small. ``h_density`` controls program
    sparsity and thereby the output fill (~0.12 at the default; ~0.05 at
    0.03 — the realistic scRNA fill, and the one that keeps a 1M-cell
    matrix under int32 nnz)."""
    rng = np.random.RandomState(seed)
    W = rng.gamma(0.5, 1.0, size=(n_cells, k_true)).astype(np.float32)
    H = (
        rng.gamma(0.45, 1.0, size=(k_true, n_genes))
        * (rng.rand(k_true, n_genes) < h_density)
    ).astype(np.float32)
    base = rng.gamma(0.3, 0.02, size=(n_genes,)).astype(np.float32)
    blocks = []
    t0 = time.perf_counter()
    for start in range(0, n_cells, block):
        stop = min(start + block, n_cells)
        rate = W[start:stop] @ H + base[None, :]
        counts = rng.poisson(rate).astype(np.float32)
        blocks.append(sp.csr_matrix(counts))
        if (start // block) % 10 == 0:
            log(f"[synthesize] {stop}/{n_cells} cells "
                f"({time.perf_counter()-t0:.0f}s)")
    X = sp.vstack(blocks).tocsr()
    empty = np.asarray(X.sum(axis=1)).ravel() == 0
    if empty.any():
        X = X.tolil()
        X[np.flatnonzero(empty), 0] = 1
        X = X.tocsr()
    return X


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--genes", type=int, default=20_000)
    ap.add_argument("--hvg", type=int, default=2000)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--n-iter", type=int, default=30)
    ap.add_argument("--h-density", type=float, default=0.08)
    ap.add_argument("--scratch", default="/tmp/cnmf_tpu_atlas")
    args = ap.parse_args()

    os.environ.setdefault("CNMF_TPU_MATMUL_PRECISION", "high")
    os.environ.setdefault("CNMF_TPU_TIMINGS", "1")
    # round-5 pipeline mode: host file writes ride the background writer and
    # overlap the device stages; the timed `flush` row below is where the
    # still-queued bytes land (durability boundary for external consumers)
    os.environ.setdefault("CNMF_TPU_ASYNC_WRITES", "1")
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import pandas as pd
    from cnmf_tpu import cNMF
    from cnmf_tpu.io.anndata_lite import AnnData
    from cnmf_tpu.io.h5ad import write_h5ad

    os.makedirs(args.scratch, exist_ok=True)
    counts_fn = os.path.join(
        args.scratch, f"counts_{args.cells}x{args.genes}.h5ad"
    )
    if not os.path.exists(counts_fn):
        log(f"[atlas] synthesizing {args.cells}x{args.genes} sparse counts ...")
        X = synthesize(args.cells, args.genes, h_density=args.h_density)
        log(f"[atlas] nnz={X.nnz} (fill {X.nnz/args.cells/args.genes:.3f})")
        ad = AnnData(
            X,
            obs=pd.DataFrame(index=[f"c{i}" for i in range(args.cells)]),
            var=pd.DataFrame(index=[f"g{j}" for j in range(args.genes)]),
        )
        write_h5ad(counts_fn, ad)
        del X, ad

    run_dir = os.path.join(args.scratch, "run")
    obj = cNMF(output_dir=run_dir, name="atlas")

    t0 = time.perf_counter()
    obj.prepare(counts_fn=counts_fn, components=[args.k], n_iter=args.n_iter,
                seed=14, num_highvar_genes=args.hvg)
    t_prep = time.perf_counter() - t0
    log(f"[atlas] prepare: {t_prep:.1f}s")

    import jax.numpy as jnp
    float(jnp.zeros(()))  # absorb link setup

    t0 = time.perf_counter()
    obj.factorize(verbose=True)
    t_fact = time.perf_counter() - t0
    log(f"[atlas] factorize (K={args.k} x {args.n_iter}): {t_fact:.1f}s")

    t0 = time.perf_counter()
    obj.combine()
    t_comb = time.perf_counter() - t0
    log(f"[atlas] combine: {t_comb:.1f}s")

    t0 = time.perf_counter()
    obj.consensus(k=args.k, density_threshold=0.5, show_clustering=False,
                  close_clustergram_fig=True)
    t_cons = time.perf_counter() - t0
    log(f"[atlas] consensus: {t_cons:.1f}s")

    t0 = time.perf_counter()
    obj.flush_writes()
    t_flush = time.perf_counter() - t0
    log(f"[atlas] flush (async writes drain): {t_flush:.1f}s")
    log(f"[atlas] TOTAL (excl. synthesis): "
        f"{t_prep + t_fact + t_comb + t_cons + t_flush:.1f}s")


if __name__ == "__main__":
    main()
