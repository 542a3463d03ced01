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

Grid: (B, N/TILE_N). X tile streams once per restart; W/H factor tiles are
small (K ≤ 64). The matmuls run on the MXU at f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = float(np.finfo(np.float32).eps)


def _kl_w_terms_kernel(x_ref, w_ref, h_ref, num_ref):
    """One (restart, row-tile) step: numerator tile for the KL W-update.

    x_ref: (TILE_N, G); w_ref: (TILE_N, K); h_ref: (K, G); num_ref: (TILE_N, K).
    """
    wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32)
    wh = jnp.maximum(wh, EPSILON)
    ratio = x_ref[:] / wh
    num_ref[0] = jnp.dot(
        ratio, h_ref[0].T, preferred_element_type=jnp.float32
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
    """
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n

    H = jnp.transpose(Ht, (0, 2, 1))  # (B, K, G)

    grid = (B, Np // tile_n)
    out = pl.pallas_call(
        _kl_w_terms_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return out[:, :N, :]


def _kl_h_terms_kernel(x_ref, w_ref, h_ref, num_ref):
    """One (restart, row-tile) step: partial numerator for the KL H-update,
    accumulated over row tiles: ``Wᵀ · (X/(W·H))`` → (K, G)."""
    i = pl.program_id(1)
    wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32)
    wh = jnp.maximum(wh, EPSILON)
    ratio = x_ref[:] / wh
    part = jnp.dot(w_ref[0].T, ratio, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        num_ref[0] = part

    @pl.when(i > 0)
    def _():
        num_ref[0] = num_ref[0] + part


def _make_beta_w_terms_kernel(beta: float):
    """Kernel factory: W-update numerator AND denominator tiles for a general
    beta loss (beta != 1, 2): num = (X ∘ WH^(β−2))·Hᵀ, den = WH^(β−1)·Hᵀ."""
    def kernel(x_ref, w_ref, h_ref, num_ref, den_ref):
        wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32)
        wh_num = jnp.maximum(wh, EPSILON) if beta - 2.0 < 0 else wh
        if beta == 0:
            ratio = x_ref[:] / (wh_num * wh_num)
        else:
            ratio = x_ref[:] * jnp.power(wh_num, beta - 2.0)
        num_ref[0] = jnp.dot(ratio, h_ref[0].T, preferred_element_type=jnp.float32)
        wh_den = jnp.maximum(wh, EPSILON) if beta - 1.0 < 0 else wh
        if beta == 0:
            g = 1.0 / wh_den
        else:
            g = jnp.power(wh_den, beta - 1.0)
        den_ref[0] = jnp.dot(g, h_ref[0].T, preferred_element_type=jnp.float32)

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

    grid = (B, Np // tile_n)
    num, den = pl.pallas_call(
        _make_beta_w_terms_kernel(beta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Wp, H)
    return num[:, :N, :], den[:, :N, :]


def _make_beta_h_terms_kernel(beta: float):
    """H-update terms accumulated over row tiles: num = Wᵀ·(X ∘ WH^(β−2)),
    den = Wᵀ·WH^(β−1), each (K, G)."""
    def kernel(x_ref, w_ref, h_ref, num_ref, den_ref):
        i = pl.program_id(1)
        wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32)
        wh_num = jnp.maximum(wh, EPSILON) if beta - 2.0 < 0 else wh
        if beta == 0:
            ratio = x_ref[:] / (wh_num * wh_num)
        else:
            ratio = x_ref[:] * jnp.power(wh_num, beta - 2.0)
        n_part = jnp.dot(w_ref[0].T, ratio, preferred_element_type=jnp.float32)
        wh_den = jnp.maximum(wh, EPSILON) if beta - 1.0 < 0 else wh
        if beta == 0:
            g = 1.0 / wh_den
        else:
            g = jnp.power(wh_den, beta - 1.0)
        d_part = jnp.dot(w_ref[0].T, g, preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            num_ref[0] = n_part
            den_ref[0] = d_part

        @pl.when(i > 0)
        def _():
            num_ref[0] = num_ref[0] + n_part
            den_ref[0] = den_ref[0] + d_part

    return kernel


@functools.partial(jax.jit, static_argnames=("beta", "interpret"))
def beta_mu_h_terms(X, W, Ht, beta: float, interpret: bool = False):
    """Fused H-update numerator/denominator for beta not in {1, 2}.
    Returns (num, den), each (B, G, K) in the Ht layout."""
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    H = jnp.transpose(Ht, (0, 2, 1))

    grid = (B, Np // tile_n)
    num, den = pl.pallas_call(
        _make_beta_h_terms_kernel(beta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, G), jnp.float32),
            jax.ShapeDtypeStruct((B, K, G), jnp.float32),
        ),
        interpret=interpret,
    )(Xp, Wp, H)
    return jnp.transpose(num, (0, 2, 1)), jnp.transpose(den, (0, 2, 1))


def _kl_xlogwh_kernel(x_ref, w_ref, h_ref, out_ref):
    """Accumulate sum over X>eps of X·log(max(W·H, eps)) per restart — the
    reconstruction-dependent term of the KL divergence (sklearn
    _beta_divergence semantics)."""
    i = pl.program_id(1)
    wh = jnp.dot(w_ref[0], h_ref[0], preferred_element_type=jnp.float32)
    wh = jnp.maximum(wh, EPSILON)
    x = x_ref[:]
    t = jnp.sum(jnp.where(x > EPSILON, x * jnp.log(wh), 0.0))

    # scalar accumulator broadcast over a min-tile block (TPU blocks must be
    # (8, 128)-aligned); the caller reads element [0, 0]
    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.full(out_ref.shape[1:], t, jnp.float32)

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + t


@functools.partial(jax.jit, static_argnames=("interpret",))
def kl_x_log_wh(X, W, Ht, interpret: bool = False):
    """Per-restart sum over X>eps of X·log(max(W·H, eps)). Returns (B,)."""
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    H = jnp.transpose(Ht, (0, 2, 1))

    grid = (B, Np // tile_n)
    out = pl.pallas_call(
        _kl_xlogwh_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return out[:, 0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def kl_mu_h_numerator(X, W, Ht, interpret: bool = False):
    """Fused ``Wᵀ · (X / (W·H))`` per restart. Returns (B, G, K) (transposed
    to match the Ht layout)."""
    B, N, K = W.shape
    G = X.shape[1]
    tile_n = _pick_tile(N, G, K)
    pad_n = (-N) % tile_n
    Xp = jnp.pad(X, ((0, pad_n), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n

    H = jnp.transpose(Ht, (0, 2, 1))  # (B, K, G)

    grid = (B, Np // tile_n)
    out = pl.pallas_call(
        _kl_h_terms_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, G), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, G), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, G), jnp.float32),
        interpret=interpret,
    )(Xp, Wp, H)
    return jnp.transpose(out, (0, 2, 1))
