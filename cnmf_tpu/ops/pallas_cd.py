"""Pallas TPU kernels: fused HALS coordinate-descent half-sweeps.

The XLA CD path (ops/nmf.py `_cd_half_sweep`) runs the Gauss-Seidel column
loop as a ``fori_loop`` over K device ops, and every column's gradient
``F · G[:, t]`` re-reads the whole (B, M, K) factor from HBM — K re-reads of
F per half-sweep, plus the separate X·Ht / Xᵀ·W matmul materializing a
(B, M, K) product in HBM. These kernels fuse one entire half-sweep: each
(row-tile, restart) grid step computes the data product on the MXU, then
runs all K sequential column updates on the VMEM-resident factor tile —
F and the product are read/written exactly once per sweep.

Grid order is (tile, restart): the X tile block index is constant across
consecutive restart steps, so Pallas keeps it in VMEM instead of re-DMAing
it per restart (X streams once per half-sweep, not once per restart).

Numerics mirror `_cd_half_sweep` exactly: column order 0..K-1, projected-
gradient violation summed over live columns, columns with zero gram
diagonal skipped, zero-padded rows/columns (row-tile, gene-tile and
K-bucket padding) are exact no-ops — padded factor rows start at 0 and
stay 0, contributing nothing to products or violations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget for the X block — the dominant buffer. The
# pipeline DOUBLE-BUFFERS every streamed block, and the factor tiles,
# grams, products and outputs ride alongside within the 16 MB scoped VMEM
# limit, so the X block itself must stay well under half of it.
_VMEM_BLOCK_BUDGET = int(3.5 * 2**20)


def plan_tiles(n_rows: int, n_cols: int):
    """(tile_rows, tile_cols, padded_rows, padded_cols) for a CD problem
    with an (n_rows × n_cols) data matrix.

    tile_rows sizes the W-kernel's X tile (tile_rows × padded_cols);
    tile_cols sizes the H-kernel's X tile (padded_rows × tile_cols), which
    carries the FULL row dimension — the eligibility gate in
    pipeline.solvers bounds n_rows so this fits VMEM."""
    cols128 = -(-n_cols // 128) * 128
    tile_rows = min(512, _VMEM_BLOCK_BUDGET // (cols128 * 4))
    tile_rows = max(8 * (tile_rows // 8), 8)
    pad_rows = -(-n_rows // tile_rows) * tile_rows
    # row dim of the H-kernel X tile must cover all (padded) rows
    tile_cols = min(512, _VMEM_BLOCK_BUDGET // (pad_rows * 4))
    tile_cols = max(128 * (tile_cols // 128), 128)
    pad_cols = -(-n_cols // tile_cols) * tile_cols
    return tile_rows, tile_cols, pad_rows, pad_cols


def _column_sweep(f, gram, prod, k: int):
    """All K sequential HALS column updates on a VMEM-resident factor tile.

    f: (M, K) factor tile; gram: (K, K) other-factor gram (l2 already on the
    diagonal); prod: (M, K) data product (l1 already subtracted).
    Returns (updated tile, summed |projected gradient| over live columns)."""
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, f.shape[1]), 1)
    violation = jnp.zeros((), jnp.float32)
    for t in range(k):
        g_col = gram[:, t:t + 1]                     # (K, 1)
        hess = gram[t, t]
        live = hess != 0.0
        grad = jnp.dot(f, g_col, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) \
            - prod[:, t:t + 1]                       # (M, 1)
        f_col = f[:, t:t + 1]
        pgrad = jnp.where(f_col == 0.0, jnp.minimum(grad, 0.0), grad)
        violation = violation + jnp.where(
            live, jnp.sum(jnp.abs(pgrad)), 0.0
        )
        f_new = jnp.maximum(f_col - grad / jnp.where(live, hess, 1.0), 0.0)
        f_new = jnp.where(live, f_new, f_col)
        f = jnp.where(col_ids == t, f_new, f)
    return f, violation


def _make_w_kernel(k: int, l1_reg: float):
    def kernel(x_ref, h_ref, w_ref, g_ref, wout_ref, viol_ref):
        prod = jnp.dot(x_ref[:], h_ref[0], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (TILE_N, K)
        if l1_reg != 0.0:
            prod = prod - l1_reg
        w, violation = _column_sweep(w_ref[0], g_ref[0], prod, k)
        wout_ref[0] = w
        viol_ref[0, 0] = jnp.full(viol_ref.shape[2:], violation, jnp.float32)

    return kernel


def _make_h_kernel(k: int, l1_reg: float):
    def kernel(x_ref, w_ref, h_ref, g_ref, hout_ref, viol_ref):
        # XᵀW tile: contract the (padded) row axis of the X column-tile
        prod = jax.lax.dot_general(
            x_ref[:], w_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                            # (TILE_G, K)
        if l1_reg != 0.0:
            prod = prod - l1_reg
        h, violation = _column_sweep(h_ref[0], g_ref[0], prod, k)
        hout_ref[0] = h
        viol_ref[0, 0] = jnp.full(viol_ref.shape[2:], violation, jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile_n", "l1_reg", "l2_reg", "interpret")
)
def cd_w_half_sweep(Xp, Wp, Htp, *, tile_n: int, l1_reg: float = 0.0,
                    l2_reg: float = 0.0, interpret: bool = False):
    """One fused W half-sweep. Xp: (Np, Gp); Wp: (B, Np, K); Htp: (B, Gp, K),
    all padded per plan_tiles. Returns (W_new, violation (B,))."""
    B, Np, K = Wp.shape
    Gp = Xp.shape[1]
    gram = jnp.einsum("bgk,bgl->bkl", Htp, Htp,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if l2_reg != 0.0:
        gram = gram + l2_reg * jnp.eye(K, dtype=gram.dtype)
    n_tiles = Np // tile_n
    grid = (n_tiles, B)
    W_new, viol = pl.pallas_call(
        _make_w_kernel(K, l1_reg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, Gp), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp, K), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, K), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Htp, Wp, gram)
    return W_new, jnp.sum(viol[:, :, 0, 0], axis=0)


@functools.partial(
    jax.jit, static_argnames=("tile_g", "l1_reg", "l2_reg", "interpret")
)
def cd_h_half_sweep(Xp, Wp, Htp, *, tile_g: int, l1_reg: float = 0.0,
                    l2_reg: float = 0.0, interpret: bool = False):
    """One fused Ht half-sweep (fixed W). Returns (Ht_new, violation (B,))."""
    B, Np, K = Wp.shape
    Gp = Xp.shape[1]
    gram = jnp.einsum("bnk,bnl->bkl", Wp, Wp,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if l2_reg != 0.0:
        gram = gram + l2_reg * jnp.eye(K, dtype=gram.dtype)
    n_tiles = Gp // tile_g
    grid = (n_tiles, B)
    Ht_new, viol = pl.pallas_call(
        _make_h_kernel(K, l1_reg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, tile_g), lambda i, b: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, K), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_g, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, K), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_g, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Gp, K), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Wp, Htp, gram)
    return Ht_new, jnp.sum(viol[:, :, 0, 0], axis=0)
