"""Pallas TPU kernel: fused KL multiplicative-update terms.

For beta!=2 the MU numerator is ``(X ∘ f(W·H)) · Hᵀ`` — the XLA path
(ops/nmf.py `_mu_w_terms_chunked`) must materialize the (B, N, G)
reconstruction ``W·H`` and the ratio in HBM (≈2×N·G·4 bytes per restart of
traffic). This kernel tiles the N axis and keeps the reconstruction tile in
VMEM: for each (restart, row-tile) grid step it computes
``WH = W_tile · H``, the beta-dependent ratio against ``X_tile``, and both
MU terms — numerator ``ratio · Hᵀ`` and denominator (KL: column sums of H,
precomputed; IS/general: ``g(WH) · Hᵀ``) — without ever writing an N×G
intermediate to HBM.

Grids are laid out so the X tile does NOT re-stream once per restart (the
round-3 layout's hidden cost: 2.16 GB of HBM X traffic per half-update at
the PBMC bench shapes, ~5.3 ms/sweep of pure bandwidth — the measured
9.5 TFLOP/s kernel ceiling):

* W-update kernels: grid (N/TILE_N, B) with the row-tile on the OUTER
  axis — consecutive inner steps share the X block index, so Pallas hoists
  the fetch and each X tile loads ONCE for all B restarts (÷B X traffic).
  The per-restart math is unchanged (bit-identical results).
* H-update kernels accumulate over row tiles, which pins the row axis to
  the inner grid dimension; they amortize X instead by processing R_BLK
  restarts per grid step (÷R_BLK X traffic), looping restarts sequentially
  inside the kernel (bit-identical per restart).

The matmuls run on the MXU at f32; their K-thin shapes cap utilization at
~K/128 of peak — the HBM fixes above move the kernels from
bandwidth-bound toward that shape ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = float(np.finfo(np.float32).eps)


def _dot_precision():
    """Matmul precision inside the kernels. Mosaic supports only DEFAULT
    (fast bf16 passes) and HIGHEST; the library's sklearn-parity settings
    ('highest'/'high', ops.nmf.MATMUL_PRECISION) map to HIGHEST — measured
    drift vs the f64 oracle after 100 KL sweeps: DEFAULT 3.2e-3 relative on
    the factors (outside the 1e-4 parity budget), HIGHEST ~1e-6.
    'default' opts into the fast path (~3x the matmul throughput)."""
    from cnmf_tpu.ops.nmf import MATMUL_PRECISION

    if MATMUL_PRECISION in ("highest", "high"):
        return jax.lax.Precision.HIGHEST
    return None


def _kl_w_terms_kernel(x_ref, w_ref, h_ref, num_ref):
    """One (restart, row-tile) step: numerator tile for the KL W-update.

    x_ref: (TILE_N, G); w_ref: (TILE_N, K); h_ref: (K, G); num_ref: (TILE_N, K).
    """
    wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32,
                     precision=_dot_precision())
    wh = jnp.maximum(wh, EPSILON)
    ratio = x_ref[:] / wh
    num_ref[0] = jnp.dot(
        ratio, h_ref[0].T, preferred_element_type=jnp.float32,
        precision=_dot_precision(),
    )


def _pick_tile(n: int, g: int, k: int, vmem_budget: int = 6 * 2**20) -> int:
    """Row-tile size: keep x/wh/ratio tiles within the VMEM budget.

    The budget leaves headroom under the 16 MB scoped-vmem limit for the
    pipeline's double buffering of the X block across grid steps: at 8 MB
    the compiled allocation lands at ~17 MB when the call sits inside a
    larger program (measured OOM inside the device-ladder while cascade at
    G=2000), so 6 MB keeps 2×(tile×G×4B) + factor tiles ≈ 12-13 MB."""
    per_row = (2 * g + 2 * k) * 4  # x + wh/ratio (reused) + w + num, f32
    tile = max(vmem_budget // max(per_row, 1), 8)
    tile = min(tile, n, 1024)
    return max(8 * (tile // 8), 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kl_mu_w_numerator(X, W, Ht, interpret: bool = False):
    """Fused ``(X / (W·H)) · Hᵀ`` per restart without HBM N×G intermediates.

    X: (N, G); W: (B, N, K); Ht: (B, G, K). Returns (B, N, K).

    Grid (row-tile OUTER, restart inner): the X block index is constant
    across the inner axis, so each X tile is fetched once for ALL restarts
    instead of once per restart (measured 2.16 GB → 22 MB of X traffic per
    W half-update at B=100, N=2700, G=2000)."""
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n

    H = jnp.transpose(Ht, (0, 2, 1))  # (B, K, G)

    grid = (Np // tile_n, B)
    out = pl.pallas_call(
        _kl_w_terms_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return out[:, :N, :]


def _make_kl_h_terms_kernel(r_blk: int):
    """One (restart-block, row-tile) step: partial KL H-update numerators
    for ``r_blk`` restarts, accumulated over row tiles: ``Wᵀ·(X/(W·H))`` →
    (r_blk, K, G). Restarts loop sequentially inside the kernel (unrolled,
    bit-identical per restart) so the X tile is fetched once per block."""

    def kernel(x_ref, w_ref, h_ref, num_ref):
        i = pl.program_id(1)
        x = x_ref[:]
        for r in range(r_blk):
            wh = jnp.dot(w_ref[r], h_ref[r],
                         preferred_element_type=jnp.float32,
                     precision=_dot_precision())
            wh = jnp.maximum(wh, EPSILON)
            ratio = x / wh
            part = jnp.dot(w_ref[r].T, ratio,
                           preferred_element_type=jnp.float32,
                     precision=_dot_precision())

            @pl.when(i == 0)
            def _(part=part, r=r):
                num_ref[r] = part

            @pl.when(i > 0)
            def _(part=part, r=r):
                num_ref[r] = num_ref[r] + part

    return kernel


def _pick_tile_rb(n: int, g: int, k: int, r_blk: int, n_fixed_kg: int,
                  vmem_budget: int = 6 * 2**20) -> int:
    """Row-tile size for the restart-blocked H kernels: the (r_blk, K, G)
    factor/accumulator blocks are grid-step-resident, so they come out of
    the budget before the X/WH row tiles."""
    fixed = n_fixed_kg * r_blk * k * g * 4
    per_row = (2 * g + 2 * k * r_blk) * 4
    tile = max((vmem_budget - fixed) // max(per_row, 1), 8)
    tile = min(tile, n, 1024)
    return max(8 * (tile // 8), 8)


_H_R_BLK = 4  # ÷4 X traffic; VMEM keeps (r_blk, K, G) blocks ≤ ~1.5 MB


def _make_beta_w_terms_kernel(beta: float):
    """Kernel factory: W-update numerator AND denominator tiles for a general
    beta loss (beta != 1, 2): num = (X ∘ WH^(β−2))·Hᵀ, den = WH^(β−1)·Hᵀ."""
    def kernel(x_ref, w_ref, h_ref, num_ref, den_ref):
        wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32,
                     precision=_dot_precision())
        wh_num = jnp.maximum(wh, EPSILON) if beta - 2.0 < 0 else wh
        if beta == 0:
            ratio = x_ref[:] / (wh_num * wh_num)
        else:
            ratio = x_ref[:] * jnp.power(wh_num, beta - 2.0)
        num_ref[0] = jnp.dot(ratio, h_ref[0].T, preferred_element_type=jnp.float32,
                     precision=_dot_precision())
        wh_den = jnp.maximum(wh, EPSILON) if beta - 1.0 < 0 else wh
        if beta == 0:
            g = 1.0 / wh_den
        else:
            g = jnp.power(wh_den, beta - 1.0)
        den_ref[0] = jnp.dot(g, h_ref[0].T, preferred_element_type=jnp.float32,
                     precision=_dot_precision())

    return kernel


@functools.partial(jax.jit, static_argnames=("beta", "interpret"))
def beta_mu_w_terms(X, W, Ht, beta: float, interpret: bool = False):
    """Fused W-update numerator/denominator for beta not in {1, 2}.

    Returns (num, den), each (B, N, K), with the N×G reconstruction kept in
    VMEM (sklearn _multiplicative_update_w dense semantics)."""
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    H = jnp.transpose(Ht, (0, 2, 1))

    grid = (Np // tile_n, B)  # row-tile outer: X fetched once per tile
    num, den = pl.pallas_call(
        _make_beta_w_terms_kernel(beta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Wp, H)
    return num[:, :N, :], den[:, :N, :]


def _make_beta_h_terms_kernel(beta: float, r_blk: int):
    """H-update terms accumulated over row tiles for ``r_blk`` restarts per
    grid step: num = Wᵀ·(X ∘ WH^(β−2)), den = Wᵀ·WH^(β−1), each
    (r_blk, K, G)."""
    def kernel(x_ref, w_ref, h_ref, num_ref, den_ref):
        i = pl.program_id(1)
        x = x_ref[:]
        for r in range(r_blk):
            wh = jnp.dot(w_ref[r], h_ref[r],
                         preferred_element_type=jnp.float32,
                     precision=_dot_precision())
            wh_num = jnp.maximum(wh, EPSILON) if beta - 2.0 < 0 else wh
            if beta == 0:
                ratio = x / (wh_num * wh_num)
            else:
                ratio = x * jnp.power(wh_num, beta - 2.0)
            n_part = jnp.dot(w_ref[r].T, ratio,
                             preferred_element_type=jnp.float32,
                     precision=_dot_precision())
            wh_den = jnp.maximum(wh, EPSILON) if beta - 1.0 < 0 else wh
            if beta == 0:
                g = 1.0 / wh_den
            else:
                g = jnp.power(wh_den, beta - 1.0)
            d_part = jnp.dot(w_ref[r].T, g,
                             preferred_element_type=jnp.float32,
                     precision=_dot_precision())

            @pl.when(i == 0)
            def _(n_part=n_part, d_part=d_part, r=r):
                num_ref[r] = n_part
                den_ref[r] = d_part

            @pl.when(i > 0)
            def _(n_part=n_part, d_part=d_part, r=r):
                num_ref[r] = num_ref[r] + n_part
                den_ref[r] = den_ref[r] + d_part

    return kernel


@functools.partial(jax.jit, static_argnames=("beta", "interpret"))
def beta_mu_h_terms(X, W, Ht, beta: float, interpret: bool = False):
    """Fused H-update numerator/denominator for beta not in {1, 2}.
    Returns (num, den), each (B, G, K) in the Ht layout. Restart-blocked
    (÷_H_R_BLK X traffic)."""
    B, N, K = W.shape
    G = X.shape[1]
    rb = min(_H_R_BLK, B)
    tile_n = _pick_tile_rb(N, G, K, rb, n_fixed_kg=3)
    pad_n = (-N) % tile_n
    pad_b = (-B) % rb
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, pad_b), (0, pad_n), (0, 0)))
    Np = N + pad_n
    Bp = B + pad_b
    H = jnp.transpose(Ht, (0, 2, 1))
    if pad_b:
        H = jnp.pad(H, ((0, pad_b), (0, 0), (0, 0)))

    grid = (Bp // rb, Np // tile_n)
    num, den = pl.pallas_call(
        _make_beta_h_terms_kernel(beta, rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, K, G), jnp.float32),
            jax.ShapeDtypeStruct((Bp, K, G), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Wp, H)
    return (jnp.transpose(num[:B], (0, 2, 1)),
            jnp.transpose(den[:B], (0, 2, 1)))


def _make_kl_xlogwh_kernel(r_blk: int):
    """Accumulate sum over X>eps of X·log(max(W·H, eps)) per restart — the
    reconstruction-dependent term of the KL divergence (sklearn
    _beta_divergence semantics). Restart-blocked like the H kernels."""

    def kernel(x_ref, w_ref, h_ref, out_ref):
        i = pl.program_id(1)
        x = x_ref[:]
        xmask = x > EPSILON
        for r in range(r_blk):
            wh = jnp.dot(w_ref[r], h_ref[r],
                         preferred_element_type=jnp.float32,
                     precision=_dot_precision())
            wh = jnp.maximum(wh, EPSILON)
            t = jnp.sum(jnp.where(xmask, x * jnp.log(wh), 0.0))

            # scalar accumulator broadcast over a min-tile block (TPU blocks
            # must be (8, 128)-aligned); the caller reads element [r, 0, 0]
            @pl.when(i == 0)
            def _(t=t, r=r):
                out_ref[r] = jnp.full(out_ref.shape[1:], t, jnp.float32)

            @pl.when(i > 0)
            def _(t=t, r=r):
                out_ref[r] = out_ref[r] + t

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def kl_x_log_wh(X, W, Ht, interpret: bool = False):
    """Per-restart sum over X>eps of X·log(max(W·H, eps)). Returns (B,)."""
    B, N, K = W.shape
    G = X.shape[1]
    rb = min(_H_R_BLK, B)
    tile_n = _pick_tile_rb(N, G, K, rb, n_fixed_kg=1)
    pad_n = (-N) % tile_n
    pad_b = (-B) % rb
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, pad_b), (0, pad_n), (0, 0)))
    Np = N + pad_n
    Bp = B + pad_b
    H = jnp.transpose(Ht, (0, 2, 1))
    if pad_b:
        H = jnp.pad(H, ((0, pad_b), (0, 0), (0, 0)))

    grid = (Bp // rb, Np // tile_n)
    out = pl.pallas_call(
        _make_kl_xlogwh_kernel(rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 8, 128), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8, 128), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return out[:B, 0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def kl_mu_h_numerator(X, W, Ht, interpret: bool = False):
    """Fused ``Wᵀ · (X / (W·H))`` per restart. Returns (B, G, K) (transposed
    to match the Ht layout). Restart-blocked (÷_H_R_BLK X traffic)."""
    B, N, K = W.shape
    G = X.shape[1]
    rb = min(_H_R_BLK, B)
    tile_n = _pick_tile_rb(N, G, K, rb, n_fixed_kg=2)
    pad_n = (-N) % tile_n
    pad_b = (-B) % rb
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, pad_b), (0, pad_n), (0, 0)))
    Np = N + pad_n
    Bp = B + pad_b

    H = jnp.transpose(Ht, (0, 2, 1))  # (B, K, G)
    if pad_b:
        # zero-W pad restarts produce zero numerators; sliced off below
        H = jnp.pad(H, ((0, pad_b), (0, 0), (0, 0)))

    grid = (Bp // rb, Np // tile_n)
    out = pl.pallas_call(
        _make_kl_h_terms_kernel(rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, K, G), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, K, G), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return jnp.transpose(out[:B], (0, 2, 1))
