"""Batched NMF solvers for TPU: HALS coordinate descent and multiplicative updates.

TPU-native re-design of the NMF inner loop the reference delegates to
``sklearn.decomposition.non_negative_factorization`` (reference cnmf.py:15,672).
Instead of one CPU process per (K, restart) job, the whole restart batch is a
single device program: factors carry a leading restart axis ``B`` and the data
matrix ``X`` (cells × genes, dense, HBM-resident) is shared across the batch —
each solver sweep is two large MXU matmuls (``X @ Ht`` and ``X.T @ W`` batched
over restarts) plus a K-step column-cyclic update loop on the VPU.

Solver semantics deliberately mirror sklearn's so consensus outputs match the
reference to tolerance:

* CD (``solver='cd'``, frobenius loss): cyclic coordinate descent in column
  order 0..K-1, W updated before H, stopping when the summed projected-gradient
  violation of a full sweep drops below ``tol`` × the first sweep's violation.
* MU (``solver='mu'``, any beta loss): Fevotte-Idier multiplicative updates
  with the MM exponent ``gamma``, convergence checked every 10 iterations on
  the square-rooted beta divergence.
* Fixed-spectra NNLS refits (``update_H=False``): W starts at zeros for CD and
  at ``sqrt(X.mean()/K)`` for MU.

Per-restart early stopping is expressed as a convergence mask: converged
restarts are frozen (their factors stop changing, matching the serial early
``break``) while the batch program keeps running until all restarts converge
or ``max_iter`` is reached.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)

# TPU matmuls default to bf16 inputs (~1e-2 relative error) — far outside the
# 1e-4 sklearn-parity budget. All hot contractions therefore run at HIGHEST
# (true f32 on the MXU via multi-pass) unless explicitly relaxed.
MATMUL_PRECISION = os.environ.get("CNMF_TPU_MATMUL_PRECISION", "highest")



# ----------------------------------------------------------------------
# shared-X batched contractions
# ----------------------------------------------------------------------
#
# The naive einsum ('ng,bgk->bnk') lowers to B separate (N,G)@(G,K) matmuls
# whose K≈5-60 output columns occupy a fraction of the MXU's 128 lanes. The
# restart batch is instead flattened into the output-column dimension —
# (N,G) @ (G, B·K) — so the systolic array runs at full occupancy; the
# surrounding transposes are bandwidth-cheap relative to the matmul.

def _shared_x_dot(X, F):
    """X (N,G) · F (B,G,K) → (B,N,K) via one flat (N,G)@(G,B·K) matmul."""
    B, G, K = F.shape
    flat = jnp.transpose(F, (1, 0, 2)).reshape(G, B * K)
    out = jnp.dot(X, flat, preferred_element_type=F.dtype,
                  precision=MATMUL_PRECISION)
    return jnp.transpose(out.reshape(X.shape[0], B, K), (1, 0, 2))


def _shared_xt_dot(X, F):
    """Xᵀ (G,N) · F (B,N,K) → (B,G,K) via one flat matmul."""
    B, N, K = F.shape
    flat = jnp.transpose(F, (1, 0, 2)).reshape(N, B * K)
    out = jnp.dot(X.T, flat, preferred_element_type=F.dtype,
                  precision=MATMUL_PRECISION)
    return jnp.transpose(out.reshape(X.shape[1], B, K), (1, 0, 2))


# ----------------------------------------------------------------------
# coordinate descent (HALS)
# ----------------------------------------------------------------------

def _cd_half_sweep(F, G, P, l1_reg: float, l2_reg: float):
    """One cyclic CD pass updating factor F.

    Solves min ||X - F·other|| wrt F >= 0 given precomputed grams:
      F : (B, M, K)  factor being updated
      G : (B, K, K)  gram of the other factor (HHt or WtW)
      P : (B, M, K)  data product (X·Ht or X.T·W)

    Column order is 0..K-1 (sklearn shuffle=False). Returns the updated F and
    the per-restart summed |projected gradient| violation.
    """
    B, M, K = F.shape
    # regs may be static Python floats (full solver: zero skips the op
    # bit-exactly) or traced scalars (nnls_cd_from_products: one program
    # across an alpha sweep)
    if not (isinstance(l2_reg, (int, float)) and l2_reg == 0.0):
        G = G + jnp.asarray(l2_reg, G.dtype) * jnp.eye(K, dtype=G.dtype)
    if not (isinstance(l1_reg, (int, float)) and l1_reg == 0.0):
        P = P - jnp.asarray(l1_reg, P.dtype)

    def col_update(t, carry):
        F, violation = carry
        g_col = jax.lax.dynamic_slice_in_dim(G, t, 1, axis=2)[:, :, 0]  # (B, K)
        hess = jax.lax.dynamic_slice_in_dim(g_col, t, 1, axis=1)[:, 0]  # (B,)
        p_col = jax.lax.dynamic_slice_in_dim(P, t, 1, axis=2)[:, :, 0]  # (B, M)
        f_col = jax.lax.dynamic_slice_in_dim(F, t, 1, axis=2)[:, :, 0]  # (B, M)

        grad = jnp.einsum(
            "bmk,bk->bm", F, g_col, preferred_element_type=F.dtype, precision=MATMUL_PRECISION
        ) - p_col
        pgrad = jnp.where(f_col == 0, jnp.minimum(grad, 0.0), grad)

        live = hess != 0  # whole column skipped when the hessian is 0
        violation = violation + jnp.where(
            live, jnp.sum(jnp.abs(pgrad), axis=1), 0.0
        )
        safe_hess = jnp.where(live, hess, 1.0)
        f_new = jnp.maximum(f_col - grad / safe_hess[:, None], 0.0)
        f_new = jnp.where(live[:, None], f_new, f_col)
        F = jax.lax.dynamic_update_slice_in_dim(F, f_new[:, :, None], t, axis=2)
        return F, violation

    violation0 = jnp.zeros((B,), dtype=F.dtype)
    # Keep this loop ROLLED: unrolling it (factors 2/4/16 measured on-device,
    # 1000-sweep units, interleaved arms) is monotonically slower — 40.9
    # TFLOP/s rolled vs 28.5 fully unrolled at bench shapes. XLA reuses the
    # loop buffers across iterations; the unrolled HLO loses that aliasing.
    # A K-major (B,K,M) factor layout (M in lanes for the column slices,
    # transpose-free grams/products) was also measured a LOSS on-device —
    # 7.4 vs 10.4 TFLOP/s, 250-sweep units, min-of-4 interleaved arms at
    # bench shapes — so the (B,M,K) layout stays.
    F, violation = jax.lax.fori_loop(0, K, col_update, (F, violation0))
    return F, violation


def nmf_coordinate_descent(
    X: jax.Array,
    W0: jax.Array,
    Ht0: jax.Array,
    *,
    tol: float = 1e-4,
    max_iter: int = 200,
    update_H: bool = True,
    l1_reg_W: float = 0.0,
    l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0,
    l2_reg_H: float = 0.0,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched frobenius NMF via cyclic coordinate descent.

    Parameters
    ----------
    X : (N, G) shared data matrix.
    W0 : (B, N, K) initial usages per restart.
    Ht0 : (B, G, K) initial transposed spectra per restart.
    use_pallas : run the fused half-sweep TPU kernels (ops/pallas_cd.py) —
        caller gates on backend/dtype/shape via
        pipeline.solvers.cd_pallas_eligible.

    Returns
    -------
    W : (B, N, K), Ht : (B, G, K), n_iter : (B,) int32 sweeps executed.

    One full run is a single segment of the resumable kernel (the sweep and
    convergence logic lives in nmf_cd_segment only).
    """
    B = W0.shape[0]
    W0 = jnp.asarray(W0)
    W, Ht, _, n_iter, _ = nmf_cd_segment(
        X, W0, jnp.asarray(Ht0),
        jnp.zeros(B, W0.dtype), jnp.zeros(B, jnp.int32), jnp.zeros(B, bool),
        jnp.zeros((), jnp.int32),
        seg_len=max_iter, tol=tol, update_H=update_H,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        use_pallas=use_pallas, interpret=interpret,
    )
    return W, Ht, n_iter


@functools.partial(
    jax.jit,
    static_argnames=("max_iter",),
)
def nnls_cd_from_products(
    gram: jax.Array,
    P: jax.Array,
    W0: jax.Array,
    *,
    tol: float = 1e-4,
    max_iter: int = 200,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Fixed-factor CD NNLS from loop-invariant products.

    Solves ``min_{W>=0} ||X - W·Hfix||`` given only ``gram = Hfix·Hfixᵀ``
    (B,K,K) and ``P = X·Hfixᵀ`` (B,M,K) — the ``update_H=False`` loop of
    nmf_cd_segment distilled to its invariants. Because H never changes,
    every sweep of the full solver recomputes identical HHt/XHt values; this
    entry computes them never and X itself is never touched, so refits of a
    *transposed* data matrix (the consensus TPM-spectra step, reference
    cnmf.py:948-955 via 805-820) need no materialized transpose in HBM, and
    per-sweep cost drops from O(M·G·K) to the O(M·K²) half-sweep itself.

    Identical sweep and stopping semantics to the full solver: sweep 0
    defines ``violation_init``; a restart freezes when
    ``violation / violation_init <= tol``. ``tol``/``l1_reg``/``l2_reg`` are
    traced operands (they only shift the stop test and G's diagonal / P), so
    an alpha sweep reuses ONE compiled program — only ``max_iter`` shapes the
    trace. Returns (W, n_iter)."""
    dtype = W0.dtype
    B = W0.shape[0]

    def cond(state):
        j, done, *_ = state
        return jnp.logical_and(j < max_iter, jnp.logical_not(jnp.all(done)))

    def body(state):
        j, done, W, violation_init, n_iter = state
        W_new, violation = _cd_half_sweep(W, gram, P, l1_reg, l2_reg)
        violation = violation.astype(dtype)
        violation_init = jnp.where(j == 0, violation, violation_init)
        keep = jnp.logical_not(done)
        W = jnp.where(keep[:, None, None], W_new, W)
        n_iter = jnp.where(keep, j + 1, n_iter)
        newly_done = jnp.where(
            violation_init == 0, True,
            violation / jnp.maximum(violation_init, EPSILON) <= tol,
        )
        done = jnp.logical_or(done, newly_done)
        return j + 1, done, W, violation_init, n_iter

    state0 = (
        jnp.zeros((), jnp.int32), jnp.zeros(B, bool), W0,
        jnp.zeros(B, dtype), jnp.zeros(B, jnp.int32),
    )
    _, _, W, _, n_iter = jax.lax.while_loop(cond, body, state0)
    return W, n_iter


def fixed_factor_gram(F):
    """Gram of a fixed factor: F (B, M, K) → (B, K, K).

    The one definition of the fixed-factor gram shared by every
    products-distilled refit (nnls_cd_fixed_spectra, the sparse-X and
    transpose-trick refits in pipeline/solvers.py, and the fused consensus
    TPM-spectra step)."""
    return jnp.einsum(
        "bmk,bml->bkl", F, F,
        preferred_element_type=F.dtype, precision=MATMUL_PRECISION,
    )


def fixed_factor_product_transposed(F, X):
    """P = Xᵀ·F without materializing Xᵀ: computes the SMALL (K, G) product
    Fᵀ·X and transposes that instead — an 'mg,mk->gk' einsum invites XLA to
    transpose the huge lhs in HBM (8 GB at the 100k×20k atlas config).

    F: (M, K) or (1, M, K) fixed factor; X: (M, G) device matrix sharing
    F's leading axis. Returns (1, G, K) — the transpose-trick data product
    for nnls_cd_from_products (reference cnmf.py:805-820, 948-955)."""
    F2 = F[0] if F.ndim == 3 else F
    return jnp.transpose(jnp.dot(
        F2.T, X, preferred_element_type=F2.dtype, precision=MATMUL_PRECISION,
    ))[None]


def nnls_cd_fixed_spectra(
    X, Ht0, W0, *, tol=1e-4, max_iter=200, l1_reg=0.0, l2_reg=0.0,
):
    """Fixed-spectra CD NNLS on device arrays: the one definition of the
    products-distilled refit. Builds the loop-invariant products
    (``gram = HfixᵀHfix``, ``P = X·Hfix``) once and runs
    nnls_cd_from_products — with the spectra fixed these never change across
    sweeps, so the full solver's per-sweep O(M·G·K) contractions collapse to
    one-time products + O(M·K²) half-sweeps with identical sweeps, stopping
    and factors (pinned by test_nnls_from_products_matches_full_solver).

    Shared by the batched solver's ``update_H=False`` path
    (pipeline/solvers.py), the fused consensus refits
    (ops/consensus_fused.py) and the k-stats program (ops/kstats.py);
    traceable inside jit. Returns (W (B,M,K), n_iter (B,))."""
    gram = fixed_factor_gram(Ht0)
    P = _shared_x_dot(X, Ht0)
    return nnls_cd_from_products(
        gram, P, W0, tol=tol, max_iter=max_iter,
        l1_reg=l1_reg, l2_reg=l2_reg,
    )


@functools.partial(jax.jit, static_argnames=("ks",))
def pack_spectra_true_k(handles, *, ks):
    """Concatenate the true-K rows of a pad bucket's spectra batches into
    ONE (Σ B·k, G) buffer on device.

    ``handles``: tuple of (B, pad_k, G) fetch-layout spectra (one per K in
    the bucket); ``ks``: matching tuple of true component counts. The padded
    component rows are exact zeros the host would slice off anyway — ~28% of
    result bytes at the K=5..13 grid — and per-K slice dispatches each cost
    a fresh XLA program cold (8 compiles ≈ 6.5 s through axon's remote
    compiler) plus a d→h round trip on the relay's single ordered channel.
    One pack per bucket = one compile, one transfer. The host splits the
    packed buffer back per K with zero-copy reshapes."""
    parts = [
        h[:, :k, :].reshape(h.shape[0] * k, h.shape[2])
        for h, k in zip(handles, ks)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _xla_half_sweeps(X, W, Ht, dtype, update_H,
                     l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H):
    """One full CD sweep (W half then H half) via shared-X flat matmuls.

    The single source of sweep math for nmf_cd_segment and the device-ladder
    scheduler — sklearn sweep order (W before H), gram + data product
    recomputed per half as the serial solver does."""
    HHt = jnp.einsum("bgk,bgl->bkl", Ht, Ht, preferred_element_type=dtype,
                     precision=MATMUL_PRECISION)
    XHt = _shared_x_dot(X, Ht)
    W_new, viol_w = _cd_half_sweep(W, HHt, XHt, l1_reg_W, l2_reg_W)
    if update_H:
        WtW = jnp.einsum("bnk,bnl->bkl", W_new, W_new,
                         preferred_element_type=dtype,
                         precision=MATMUL_PRECISION)
        XtW = _shared_xt_dot(X, W_new)
        Ht_new, viol_h = _cd_half_sweep(Ht, WtW, XtW, l1_reg_H, l2_reg_H)
    else:
        Ht_new, viol_h = Ht, jnp.zeros_like(viol_w)
    return W_new, Ht_new, viol_w + viol_h


@functools.partial(
    jax.jit,
    static_argnames=(
        "seg_len", "tol", "update_H", "l1_reg_W", "l1_reg_H",
        "l2_reg_W", "l2_reg_H", "use_pallas", "interpret",
    ),
)
def nmf_cd_segment(
    X, W, Ht, violation_init, n_iter, done, it0, *,
    seg_len: int, tol: float = 1e-4, update_H: bool = True,
    l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
    use_pallas: bool = False, interpret: bool = False,
):
    """Run up to ``seg_len`` CD sweeps from a resumable state.

    Same math as nmf_coordinate_descent, but the convergence state
    (violation_init, per-restart sweep counts, done mask) is carried in and
    out so a host wrapper can compact away converged restarts between
    segments. ``it0`` is the global sweep offset (sweep 0 defines
    violation_init).

    With ``use_pallas`` the two half-sweeps run as the fused VMEM-resident
    kernels of ops/pallas_cd.py (f32, single-device); the factors carry the
    kernels' row/column zero-padding across the while loop (an exact no-op —
    padded rows start at 0 and stay 0) and are sliced back at the end."""
    dtype = W.dtype
    N, G = X.shape

    if use_pallas:
        from cnmf_tpu.ops.pallas_cd import (
            cd_h_half_sweep,
            cd_w_half_sweep,
            plan_tiles,
        )

        tile_n, tile_g, Np, Gp = plan_tiles(N, G)
        X = jnp.pad(X, ((0, Np - N), (0, Gp - G)))
        W = jnp.pad(W, ((0, 0), (0, Np - N), (0, 0)))
        Ht = jnp.pad(Ht, ((0, 0), (0, Gp - G), (0, 0)))

    def half_sweeps(W, Ht):
        if use_pallas:
            W_new, viol_w = cd_w_half_sweep(
                X, W, Ht, tile_n=tile_n,
                l1_reg=l1_reg_W, l2_reg=l2_reg_W, interpret=interpret,
            )
            if update_H:
                Ht_new, viol_h = cd_h_half_sweep(
                    X, W_new, Ht, tile_g=tile_g,
                    l1_reg=l1_reg_H, l2_reg=l2_reg_H, interpret=interpret,
                )
            else:
                Ht_new, viol_h = Ht, jnp.zeros_like(viol_w)
            return W_new, Ht_new, viol_w + viol_h

        return _xla_half_sweeps(
            X, W, Ht, dtype, update_H,
            l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H,
        )

    def cond(state):
        j, done, *_ = state
        return jnp.logical_and(j < seg_len, jnp.logical_not(jnp.all(done)))

    def body(state):
        j, done, W, Ht, violation_init, n_iter = state
        git = it0 + j

        W_new, Ht_new, violation = half_sweeps(W, Ht)
        violation = violation.astype(dtype)
        violation_init = jnp.where(git == 0, violation, violation_init)

        keep = jnp.logical_not(done)
        W = jnp.where(keep[:, None, None], W_new, W)
        Ht = jnp.where(keep[:, None, None], Ht_new, Ht)
        n_iter = jnp.where(keep, git + 1, n_iter)

        newly_done = jnp.where(
            violation_init == 0, True,
            violation / jnp.maximum(violation_init, EPSILON) <= tol,
        )
        done = jnp.logical_or(done, newly_done)
        return j + 1, done, W, Ht, violation_init, n_iter

    state0 = (jnp.zeros((), jnp.int32), done, W, Ht, violation_init, n_iter)
    _, done, W, Ht, violation_init, n_iter = jax.lax.while_loop(cond, body, state0)
    if use_pallas:
        W = W[:, :N]
        Ht = Ht[:, :G]
    return W, Ht, violation_init, n_iter, done


def nmf_coordinate_descent_compacted(
    X, W0, Ht0, *, tol: float = 1e-4, max_iter: int = 200,
    update_H: bool = True, l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
    seg_len: int = 250, bucket: int = 32,
):
    """CD with between-segment restart compaction.

    Restarts converge at very different sweep counts (tens to max_iter); the
    plain batched solver pays the slowest restart's cost for the whole batch.
    This wrapper solves in ``seg_len``-sweep segments, pulls the done mask to
    the host between segments, and re-batches the active restarts. Exactly
    two batch shapes ever compile — the full batch and ``bucket`` (used once
    the stragglers fit in it) — keeping the XLA program count bounded.
    Results are bit-identical to the plain solver: frozen restarts never
    update, and padding slots are marked done from the start.
    """
    X = jnp.asarray(X)
    B = W0.shape[0]
    dtype = np.asarray(W0).dtype
    out_W = np.empty(W0.shape, dtype)
    out_Ht = np.empty(Ht0.shape, dtype)
    out_n = np.zeros(B, np.int32)

    # all solver state stays on device between segments — only the tiny done
    # mask and sweep counts cross the host boundary, plus each restart's
    # factors exactly once when it finishes (same total bytes as the plain
    # solver's final fetch, which matters on links where HBM↔host is slow)
    Wd = jnp.asarray(W0)
    Htd = jnp.asarray(Ht0)
    vd = jnp.zeros(B, Wd.dtype)
    nd = jnp.zeros(B, jnp.int32)
    dd = jnp.zeros(B, bool)

    active = np.arange(B)
    it = 0
    while len(active) > 0 and it < max_iter:
        seg = min(seg_len, max_iter - it)
        Wd, Htd, vd, nd, dd = nmf_cd_segment(
            X, Wd, Htd, vd, nd, dd, jnp.asarray(it, jnp.int32),
            seg_len=seg, tol=tol, update_H=update_H,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        )
        it += seg
        if it >= max_iter:
            break

        done_h = np.asarray(dd)
        a = len(active)
        live_rows = ~done_h[:a] if len(done_h) >= a else ~done_h
        # positions in the CURRENT batch that are real (not padding)
        real = np.arange(a)
        finished_rows = real[done_h[:a]]
        if finished_rows.size:
            n_h = np.asarray(nd)
            out_W[active[done_h[:a]]] = np.asarray(Wd[finished_rows])
            out_Ht[active[done_h[:a]]] = np.asarray(Htd[finished_rows])
            out_n[active[done_h[:a]]] = n_h[finished_rows]
        still_rows = real[live_rows]
        active = active[live_rows]
        if len(active) == 0:
            break
        if finished_rows.size == 0:
            continue

        # re-batch the survivors on device: two shapes only (full B or bucket)
        a2 = len(active)
        target = bucket if a2 <= bucket and B > bucket else B
        pad = target - a2
        gather = np.concatenate([still_rows, still_rows[:1].repeat(pad)]) if pad \
            else still_rows
        gd = jnp.asarray(gather)
        Wd = jnp.take(Wd, gd, axis=0)
        Htd = jnp.take(Htd, gd, axis=0)
        vd = jnp.take(vd, gd)
        nd = jnp.take(nd, gd)
        dd = jnp.asarray(np.concatenate([np.zeros(a2, bool), np.ones(pad, bool)]))

    if len(active) > 0:
        done_h = np.asarray(dd)
        n_h = np.asarray(nd)
        a = len(active)
        out_W[active] = np.asarray(Wd[:a])
        out_Ht[active] = np.asarray(Htd[:a])
        out_n[active] = n_h[:a]

    return out_W, out_Ht, out_n


def _ladder(b0: int, min_bucket: int = 32):
    """Descending batch-size ladder (each a multiple of 8, halving down to
    ``min_bucket``) — the only shapes the grid scheduler ever compiles."""
    sizes = [max(8 * ((b0 + 7) // 8), 8)]
    while sizes[-1] > min_bucket:
        sizes.append(max(min_bucket, 8 * ((sizes[-1] // 2 + 7) // 8)))
    return sizes


_swap_bg_axes = jax.jit(lambda h: jnp.swapaxes(h, 1, 2))


def _async_host_copy(arr):
    try:
        arr.copy_to_host_async()
    except Exception:
        pass


def nmf_cd_grid(
    X, W0, Ht0, *, tol: float = 1e-4, max_iter: int = 200,
    l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
    seg_len: int = 125, min_bucket: int = 32,
):
    """Tail-compacted batched CD over a merged restart grid.

    The plain batched solver pays the SLOWEST restart's sweep count for the
    whole batch — measured 2.6× the useful FLOPs on the PBMC-scale K-grid
    (n_iter max≈1000 vs mean≈250). This scheduler runs ``seg_len``-sweep
    segments and, as restarts converge, re-packs the survivors into smaller
    batches from a fixed size ladder, so device sweeps track the n_iter
    distribution instead of its max. It replaces the reference's
    one-process-per-(K,iter) scheduling (reference cnmf.py:692-745) for all
    restarts that share one padded component count.

    Designed for a high-latency host↔device link:
      * done masks come back via ``copy_to_host_async`` and are only READ two
        segments late, so the device queue never drains waiting on the host;
      * spectra leave the device transposed to (B, K, G) and stream host-ward
        asynchronously at each re-pack, overlapping later segments;
      * only ladder shapes ever compile (bounded XLA program count).

    Results are bit-identical to ``nmf_coordinate_descent``: converged
    restarts are frozen inside the kernel, batch position does not enter any
    per-restart reduction, and ladder padding slots start done. Returns
    ``(spectra (B, K, G) host array, n_iter (B,) host array)`` — usages are
    not fetched (factorize discards them, reference cnmf.py:742-745).
    """
    X = jnp.asarray(X)
    W0 = jnp.asarray(W0)
    Ht0 = jnp.asarray(Ht0)
    B0 = W0.shape[0]
    ladder = _ladder(B0, min_bucket)

    Bp = ladder[0]
    if Bp > B0:
        W0 = jnp.concatenate([W0, jnp.repeat(W0[:1], Bp - B0, axis=0)])
        Ht0 = jnp.concatenate([Ht0, jnp.repeat(Ht0[:1], Bp - B0, axis=0)])
    state = (
        W0, Ht0,
        jnp.zeros(Bp, W0.dtype), jnp.zeros(Bp, jnp.int32),
        jnp.asarray(np.arange(Bp) >= B0),
    )
    seg_kwargs = dict(
        tol=tol, update_H=True,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
    )
    pos2orig = np.concatenate([np.arange(B0), np.full(Bp - B0, -1)])
    fetches = _cd_ladder_run(
        X, state, pos2orig, np.zeros(B0, bool), 0, max_iter,
        seg_kwargs, seg_len, ladder,
    )
    return _extract_grid_results(fetches, B0, Ht0.shape[2], Ht0.shape[1],
                                 np.dtype(W0.dtype))


def _cd_ladder_run(X, state, pos2orig, done_orig, it0, max_iter,
                   seg_kwargs, seg_len, ladder):
    """Segment + ladder-compaction loop from a resumable CD state.

    ``state`` = (W, Ht, violation_init, n_iter, done) device arrays at batch
    size ``len(pos2orig)``; ``pos2orig`` maps batch position → original
    restart id (-1 = padding); ``done_orig`` is the host's (lagging)
    knowledge of which original restarts have converged. Returns the
    ``fetches`` list consumed by ``_extract_grid_results`` — each entry is
    (spectra handle (B, K, G), n_iter handle, pos2orig snapshot, the
    done-knowledge under which rows of that fetch are final)."""
    B0 = len(done_orig)
    Wd, Htd, vd, nd, dd = state
    fetches = []
    pending = []  # (mask_handle, p2o snapshot)

    def read_mask(entry):
        mask, p2o = entry
        m = np.asarray(mask)
        real = p2o >= 0
        done_orig[p2o[real & m[: len(p2o)]]] = True

    it = it0
    while it < max_iter:
        seg = min(seg_len, max_iter - it)
        Wd, Htd, vd, nd, dd = nmf_cd_segment(
            X, Wd, Htd, vd, nd, dd, jnp.asarray(it, jnp.int32),
            seg_len=seg, **seg_kwargs,
        )
        it += seg
        _async_host_copy(dd)
        pending.append((dd, pos2orig))

        # read masks two segments late: their transfers raced the in-between
        # segment's device execution, so this rarely blocks
        if len(pending) >= 3 or it >= max_iter:
            read_mask(pending.pop(0))
            alive = int(B0 - done_orig.sum())
            if alive == 0:
                break
            cur = len(pos2orig)
            target = next((s for s in reversed(ladder) if s >= alive), cur)
            if target < cur and len(pending) > 1:
                # about to re-pack: consume the older in-flight masks too
                # (each pairs with its own pos2orig snapshot, and its
                # transfer has had >=1 full segment to land) so the re-pack
                # sees every convergence the device has reported — without
                # them, restarts done in the last two segments would ride
                # along frozen. The NEWEST mask stays pending: reading it
                # would sync on the still-executing segment.
                while len(pending) > 1:
                    read_mask(pending.pop(0))
                alive = int(B0 - done_orig.sum())
                if alive == 0:
                    break
                target = next((s for s in reversed(ladder) if s >= alive), cur)
            if target < cur:
                # stream current spectra host-ward, then re-pack survivors
                spec = _swap_bg_axes(Htd)
                _async_host_copy(spec)
                _async_host_copy(nd)
                fetches.append((spec, nd, pos2orig, done_orig.copy()))
                keep = np.where(
                    (pos2orig >= 0) & ~done_orig[np.clip(pos2orig, 0, None)]
                )[0]
                pad = target - len(keep)
                gd = jnp.asarray(
                    np.concatenate([keep, np.zeros(pad, np.int64)])
                )
                Wd = jnp.take(Wd, gd, axis=0)
                Htd = jnp.take(Htd, gd, axis=0)
                vd = jnp.take(vd, gd)
                nd = jnp.take(nd, gd)
                dd = jnp.logical_or(
                    jnp.take(dd, gd), jnp.asarray(np.arange(target) >= len(keep))
                )
                pos2orig = np.concatenate(
                    [pos2orig[keep], np.full(pad, -1)]
                )
                # the still-pending newest mask stays readable: read_mask
                # uses the pos2orig snapshot captured WITH the mask handle,
                # so pre-re-pack positions resolve correctly

    fetches.append((_swap_bg_axes(Htd), nd, pos2orig, np.ones(B0, bool)))
    return fetches


def _extract_grid_results(fetches, B0, K, G, dtype):
    """Assemble (spectra (B0, K, G), n_iter (B0,)) host arrays from ladder
    fetches: each original restart is taken from the FIRST fetch whose
    done-knowledge marks it final (frozen thereafter — exact)."""
    out_spec = np.empty((B0, K, G), dtype)
    out_n = np.zeros(B0, np.int32)
    extracted = np.zeros(B0, bool)
    for spec_h, n_h, p2o, known in fetches:
        arr = np.asarray(spec_h)
        n = np.asarray(n_h)
        orig = np.clip(p2o, 0, None)
        sel = (p2o >= 0) & known[orig] & ~extracted[orig]
        if sel.any():
            rows = p2o[sel]
            out_spec[rows] = arr[sel]
            out_n[rows] = n[: len(p2o)][sel]
            extracted[rows] = True
    return out_spec, out_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter", "tol", "ladder",
        "l1_reg_W", "l1_reg_H", "l2_reg_W", "l2_reg_H",
    ),
)
def nmf_cd_device_ladder(
    X, W0, Ht0, *, tol: float = 1e-4, max_iter: int = 200,
    ladder: tuple = (), l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
):
    """Tail-compacted batched CD with ON-DEVICE restart compaction.

    The plain batched solver pays the slowest restart's sweep count for the
    whole batch (measured 2.64x the useful FLOPs at the PBMC bench config);
    every host-mediated compaction scheduler in this module loses that saving
    back to host↔device latency (the done-mask reads serialize on the relay's
    single ordered channel). This kernel keeps the *entire* schedule inside
    ONE XLA program: a Python-unrolled cascade of ``while_loop`` stages at
    the static batch sizes of ``ladder`` (descending, ladder[0] >= B0). Each
    stage sweeps until its survivor count fits the next rung (or max_iter);
    between stages the batch re-packs on device — a stable argsort on the
    done mask gathers live restarts to the front — and every row's spectra
    are scattered into a (B0+1)-row output buffer via its original-position
    index (the +1 row absorbs ladder padding). Replaces the reference's
    one-process-per-(K,iter) scheduling (reference cnmf.py:692-745) with a
    single device dispatch and no control-plane traffic at all.

    Exact vs nmf_coordinate_descent: frozen restarts never update, batch
    position enters no per-restart reduction (the flat shared-X matmul
    computes each restart's columns independently), dropped rows are always
    either converged or at max_iter, and a row's final scatter always lands
    after its last update. Pinned by tests/test_device_ladder.py (identical
    n_iter, spectra at 1e-6).

    Returns ``(spectra (B0, K, G), n_iter (B0,), stage_sweeps
    (len(ladder),))`` device arrays — spectra already transposed to fetch
    layout; ``stage_sweeps[i]`` counts the sweeps executed at batch size
    ``ladder[i]`` (executed FLOPs = Σ ladder[i]·stage_sweeps[i] restart-
    sweeps, the honest device-work figure the bench reports); usages are not
    returned (factorize discards them, reference cnmf.py:742-745).
    """
    dtype = W0.dtype
    B0, N, K = W0.shape
    G = X.shape[1]
    if not ladder:
        ladder = (B0,)
    assert ladder[0] >= B0 and all(
        a > b for a, b in zip(ladder, ladder[1:])
    ), ladder
    pad = ladder[0] - B0
    W = jnp.concatenate([W0, jnp.repeat(W0[:1], pad, axis=0)]) if pad else W0
    Ht = (
        jnp.concatenate([Ht0, jnp.repeat(Ht0[:1], pad, axis=0)])
        if pad else Ht0
    )
    Bp = ladder[0]
    done = jnp.arange(Bp) >= B0
    # original restart id per batch position; padding rows dump into row B0
    pos = jnp.minimum(jnp.arange(Bp, dtype=jnp.int32), B0)
    out_Ht = jnp.zeros((B0 + 1, K, G), dtype)
    out_n = jnp.zeros(B0 + 1, jnp.int32)

    git = jnp.zeros((), jnp.int32)
    vi = jnp.zeros(Bp, dtype)
    ni = jnp.zeros(Bp, jnp.int32)
    stage_ends = []

    for si, s in enumerate(ladder):
        nxt = ladder[si + 1] if si + 1 < len(ladder) else 0

        def cond(st, nxt=nxt, s=s):
            git, W, Ht, vi, ni, done, pos = st
            alive = s - jnp.sum(done)
            return jnp.logical_and(git < max_iter, alive > nxt)

        def body(st):
            git, W, Ht, vi, ni, done, pos = st
            W_new, Ht_new, violation = _xla_half_sweeps(
                X, W, Ht, dtype, True,
                l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H,
            )
            violation = violation.astype(dtype)
            vi = jnp.where(git == 0, violation, vi)
            keep = jnp.logical_not(done)
            W = jnp.where(keep[:, None, None], W_new, W)
            Ht = jnp.where(keep[:, None, None], Ht_new, Ht)
            ni = jnp.where(keep, git + 1, ni)
            newly_done = jnp.where(
                vi == 0, True,
                violation / jnp.maximum(vi, EPSILON) <= tol,
            )
            done = jnp.logical_or(done, newly_done)
            return git + 1, W, Ht, vi, ni, done, pos

        git, W, Ht, vi, ni, done, pos = jax.lax.while_loop(
            cond, body, (git, W, Ht, vi, ni, done, pos)
        )
        # flush this stage's rows to the output buffer: finished rows are
        # final here; rows that ride on are overwritten by a later flush
        out_Ht = out_Ht.at[pos].set(jnp.swapaxes(Ht, 1, 2))
        out_n = out_n.at[pos].set(ni)
        stage_ends.append(git)
        if nxt:
            # survivors to the front (stable: preserves restart order),
            # then shrink to the next static rung
            order = jnp.argsort(done, stable=True)[:nxt]
            W, Ht = W[order], Ht[order]
            vi, ni = vi[order], ni[order]
            done, pos = done[order], pos[order]

    ends = jnp.stack(stage_ends)
    stage_sweeps = jnp.diff(ends, prepend=jnp.zeros(1, ends.dtype))
    return out_Ht[:B0], out_n[:B0], stage_sweeps


def nmf_cd_staged(
    X, inits, *, tol: float = 1e-4, max_iter: int = 200,
    l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
    s0: int = 250, seg_len: int = 125, min_bucket: int = 32,
):
    """Two-phase tail-compacted CD over a multi-K restart grid.

    ``inits`` is a list of per-K (W0 (B_k, N, pad_k), Ht0 (B_k, G, pad_k))
    batches (pad_k may differ across entries). Phase 1 dispatches every K's
    batch for up to ``s0`` sweeps back-to-back — keeping each K batch's
    natural early exit (a fast K stops the moment its own slowest restart
    converges, paying nothing for other Ks). The survivors of ALL Ks then
    merge on device — zero-padded to the max pad_k (exact no-op) — into one
    ladder-compacted continuation (``_cd_ladder_run``), so the long tail of
    slow restarts runs at a batch size that tracks how many are actually
    left instead of 100-per-K.

    vs the pure merged grid (nmf_cd_grid, measured 2x SLOWER than per-K):
    phase 1 is exactly the production per-K dispatch pattern (no merging
    where early exit wins), and the single merge point costs one mask read
    per K, overlapped with phase-1 execution.

    Exact: segments are resumable (violation_init / n_iter / done carried),
    frozen restarts never update, and component zero-padding is a no-op for
    CD. Returns a list of per-K (spectra (B_k, pad_k, G) host, n_iter
    (B_k,) host) in input order.
    """
    X = jnp.asarray(X)
    seg_kwargs = dict(
        tol=tol, update_H=True,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
    )
    s0 = min(s0, max_iter)

    # --- phase 1: per-K segment dispatches, all async ---------------------
    states = []
    for W0, Ht0 in inits:
        W0 = jnp.asarray(W0)
        Ht0 = jnp.asarray(Ht0)
        B = W0.shape[0]
        st = nmf_cd_segment(
            X, W0, Ht0, jnp.zeros(B, W0.dtype), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, bool), jnp.zeros((), jnp.int32),
            seg_len=s0, **seg_kwargs,
        )
        spec = _swap_bg_axes(st[1])
        _async_host_copy(spec)      # converged restarts' spectra
        _async_host_copy(st[3])     # n_iter
        _async_host_copy(st[4])     # done mask
        states.append((st, spec))

    results = [None] * len(inits)
    if s0 >= max_iter:
        for i, (st, spec) in enumerate(states):
            results[i] = (np.asarray(spec), np.asarray(st[3]))
        return results

    # --- merge survivors on device, zero-padding pad_k to the max ---------
    pad_max = max(int(st[0].shape[2]) for st, _ in states)
    survivors = []   # (k_index, row_in_k, position_in_merged)
    parts = []
    for i, (st, spec) in enumerate(states):
        done = np.asarray(st[4])
        keep = np.where(~done)[0]
        if keep.size == 0:
            continue
        gd = jnp.asarray(keep)
        part = tuple(jnp.take(a, gd, axis=0) for a in st)
        kpad = pad_max - part[0].shape[2]
        if kpad:
            part = (
                jnp.pad(part[0], ((0, 0), (0, 0), (0, kpad))),
                jnp.pad(part[1], ((0, 0), (0, 0), (0, kpad))),
            ) + part[2:]
        parts.append(part)
        survivors.extend((i, int(r)) for r in keep)

    # phase-1 spectra cover everything that already converged
    phase1 = [(np.asarray(spec), np.asarray(st[3]), np.asarray(st[4]))
              for st, spec in states]

    if parts:
        n_sur = len(survivors)
        ladder = _ladder(n_sur, min_bucket)
        Bp = ladder[0]
        merged = [jnp.concatenate([p[j] for p in parts], axis=0)
                  for j in range(5)]
        if Bp > n_sur:
            pad = Bp - n_sur
            merged[0] = jnp.concatenate(
                [merged[0], jnp.repeat(merged[0][:1], pad, axis=0)])
            merged[1] = jnp.concatenate(
                [merged[1], jnp.repeat(merged[1][:1], pad, axis=0)])
            merged[2] = jnp.concatenate([merged[2], jnp.zeros(pad, merged[2].dtype)])
            merged[3] = jnp.concatenate([merged[3], jnp.zeros(pad, jnp.int32)])
            merged[4] = jnp.concatenate([merged[4], jnp.ones(pad, bool)])
        pos2orig = np.concatenate(
            [np.arange(n_sur), np.full(Bp - n_sur, -1)]
        )
        fetches = _cd_ladder_run(
            X, tuple(merged), pos2orig, np.zeros(n_sur, bool), s0, max_iter,
            seg_kwargs, seg_len, ladder,
        )
        sur_spec, sur_n = _extract_grid_results(
            fetches, n_sur, pad_max, merged[1].shape[1],
            np.dtype(str(merged[0].dtype)),
        )
    else:
        sur_spec = sur_n = None

    # --- scatter back into per-K outputs ----------------------------------
    for i, (spec1, n1, done1) in enumerate(phase1):
        out_spec = np.array(spec1)
        out_n = np.array(n1)
        results[i] = (out_spec, out_n)
    for pos, (i, row) in enumerate(survivors):
        kpad_i = results[i][0].shape[1]
        results[i][0][row] = sur_spec[pos, :kpad_i, :]
        results[i][1][row] = sur_n[pos]
    return results


# ----------------------------------------------------------------------
# beta divergence
# ----------------------------------------------------------------------

def _frobenius_error_gram(X_sq_norm, W, Ht):
    """||X - W·H||_F per restart via gram matrices (no N×G intermediate)."""
    WtW = jnp.einsum("bnk,bnl->bkl", W, W, preferred_element_type=W.dtype, precision=MATMUL_PRECISION)
    HHt = jnp.einsum("bgk,bgl->bkl", Ht, Ht, preferred_element_type=W.dtype, precision=MATMUL_PRECISION)
    # trace(WtW @ HHt)
    wh_norm = jnp.einsum("bkl,bkl->b", WtW, HHt)
    return X_sq_norm + wh_norm


def frobenius_error(X, W, Ht, XHt: Optional[jax.Array] = None):
    """sqrt(||X - WH||²_F) per restart, computed via K×K grams."""
    X_sq = jnp.sum(X * X)
    if XHt is None:
        XHt = _shared_x_dot(X, Ht)
    cross = jnp.einsum("bnk,bnk->b", W, XHt)
    sq = _frobenius_error_gram(X_sq, W, Ht) - 2.0 * cross
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _beta_divergence_chunked(X, W, Ht, beta: float, chunk: int,
                             precision=None):
    """sqrt(2·beta_div) per restart for beta != 2, scanning restart chunks.

    Materializes the (chunk, N, G) reconstruction only per chunk to bound HBM.
    Mirrors sklearn's dense _beta_divergence exactly: entries with
    X <= float32-eps are excluded from the elementwise terms, the
    reconstruction is floored at float32-eps, and for KL the full sum(WH) is
    taken via the rank-K identity dot(sum_n W, sum_g H).
    ``precision``: per-call matmul precision override (the MU precision
    ladder's coarse phase) — None = the module MATMUL_PRECISION."""
    prec = precision or MATMUL_PRECISION
    B = W.shape[0]
    dtype = W.dtype

    pad = (-B) % chunk
    Wp = jnp.pad(W, ((0, pad), (0, 0), (0, 0)))
    Htp = jnp.pad(Ht, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (B + pad) // chunk
    Wc = Wp.reshape(n_chunks, chunk, *W.shape[1:])
    Htc = Htp.reshape(n_chunks, chunk, *Ht.shape[1:])

    mask = X > EPSILON
    if beta == 1:
        sum_X = jnp.sum(jnp.where(mask, X, 0.0))
        X_log_X = jnp.sum(jnp.where(mask, X * jnp.log(jnp.maximum(X, EPSILON)), 0.0))
        # full sum(W·H) without materializing it
        sum_WH = jnp.einsum("bnk,bgk->b", W, Ht)

    def one_chunk(carry, inp):
        Wb, Htb = inp
        WH = jnp.einsum("bnk,bgk->bng", Wb, Htb, preferred_element_type=dtype, precision=prec)
        WH_safe = jnp.maximum(WH, EPSILON)
        if beta == 1:
            # masked sum of X·log(WH); X-only terms added outside the scan
            div = -jnp.sum(
                jnp.where(mask[None], X[None] * jnp.log(WH_safe), 0.0), axis=(1, 2)
            )
        elif beta == 0:
            ratio = X[None] / WH_safe
            # sum over masked entries of (div - log div), minus the FULL
            # element count (sklearn subtracts np.prod(X.shape) — kept as-is)
            div = jnp.sum(
                jnp.where(mask[None], ratio - jnp.log(jnp.maximum(ratio, EPSILON)), 0.0),
                axis=(1, 2),
            ) - X.size
        else:
            sum_WH_beta = jnp.sum(jnp.power(WH, beta), axis=(1, 2))
            sum_X_WH = jnp.sum(
                jnp.where(mask[None], X[None] * jnp.power(WH_safe, beta - 1.0), 0.0),
                axis=(1, 2),
            )
            sum_X_beta = jnp.sum(jnp.where(mask, jnp.power(X, beta), 0.0))
            div = (
                sum_X_beta - beta * sum_X_WH + sum_WH_beta * (beta - 1.0)
            ) / (beta * (beta - 1.0))
        return carry, div

    _, divs = jax.lax.scan(one_chunk, None, (Wc, Htc))
    divs = divs.reshape(-1)[:B]
    if beta == 1:
        divs = divs + X_log_X - sum_X + sum_WH
    elif beta == 0:
        # each padded-out chunk element also subtracted X.size; only real
        # entries matter after the slice above, nothing to correct
        pass
    return jnp.sqrt(jnp.maximum(2.0 * divs, 0.0))


def beta_divergence_error(X, W, Ht, beta: float, chunk: int = 8,
                          use_pallas: bool = False, precision=None):
    """sqrt(2·beta_div(X, WH)) per restart (sklearn square_root=True)."""
    if beta == 2:
        return frobenius_error(X, W, Ht)
    if beta == 1 and use_pallas:
        from cnmf_tpu.ops.pallas_mu import kl_x_log_wh

        mask = X > EPSILON
        sum_X = jnp.sum(jnp.where(mask, X, 0.0))
        X_log_X = jnp.sum(jnp.where(mask, X * jnp.log(jnp.maximum(X, EPSILON)), 0.0))
        sum_WH = jnp.einsum("bnk,bgk->b", W, Ht)
        divs = -kl_x_log_wh(X, W, Ht) + X_log_X - sum_X + sum_WH
        return jnp.sqrt(jnp.maximum(2.0 * divs, 0.0))
    return _beta_divergence_chunked(X, W, Ht, beta, chunk,
                                    precision=precision)


# ----------------------------------------------------------------------
# multiplicative updates
# ----------------------------------------------------------------------

def _mu_update_w(X, W, Ht, beta: float, gamma: float,
                 l1_reg: float, l2_reg: float, chunk: int,
                 use_pallas: bool = False, precision=None):
    dtype = W.dtype
    if beta == 2:
        XHt = _shared_x_dot(X, Ht)
        HHt = jnp.einsum("bgk,bgl->bkl", Ht, Ht, preferred_element_type=dtype, precision=MATMUL_PRECISION)
        numerator = XHt
        denominator = jnp.einsum("bnk,bkl->bnl", W, HHt, preferred_element_type=dtype, precision=MATMUL_PRECISION)
    elif beta == 1 and use_pallas:
        from cnmf_tpu.ops.pallas_mu import kl_mu_w_numerator

        numerator = kl_mu_w_numerator(X, W, Ht)
        h_sum = jnp.sum(Ht, axis=1)  # (B, K)
        denominator = jnp.broadcast_to(h_sum[:, None, :], numerator.shape)
    elif use_pallas:
        from cnmf_tpu.ops.pallas_mu import beta_mu_w_terms

        numerator, denominator = beta_mu_w_terms(X, W, Ht, beta)
    else:
        numerator, denominator = _mu_w_terms_chunked(X, W, Ht, beta, chunk,
                                                     precision=precision)

    if l1_reg > 0:
        denominator = denominator + l1_reg
    if l2_reg > 0:
        denominator = denominator + l2_reg * W
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    delta = numerator / denominator
    if gamma != 1.0:
        delta = jnp.power(delta, gamma)
    return W * delta


def _mu_w_terms_chunked(X, W, Ht, beta: float, chunk: int, precision=None):
    """numerator = (X ∘ WH^(beta-2)) · H.T ; denominator per beta, chunked over B."""
    prec = precision or MATMUL_PRECISION
    B = W.shape[0]
    dtype = W.dtype
    pad = (-B) % chunk
    Wp = jnp.pad(W, ((0, pad), (0, 0), (0, 0)))
    Htp = jnp.pad(Ht, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (B + pad) // chunk
    Wc = Wp.reshape(n_chunks, chunk, *W.shape[1:])
    Htc = Htp.reshape(n_chunks, chunk, *Ht.shape[1:])

    def one_chunk(carry, inp):
        Wb, Htb = inp
        WH = jnp.einsum("bnk,bgk->bng", Wb, Htb, preferred_element_type=dtype, precision=prec)
        WH_num = jnp.maximum(WH, EPSILON) if beta - 2.0 < 0 else WH
        if beta == 1:
            ratio = X[None] / WH_num
        elif beta == 0:
            ratio = X[None] / (WH_num * WH_num)
        else:
            ratio = X[None] * jnp.power(WH_num, beta - 2.0)
        num = jnp.einsum("bng,bgk->bnk", ratio, Htb, preferred_element_type=dtype, precision=prec)
        if beta == 1:
            den = jnp.broadcast_to(
                jnp.sum(Htb, axis=1)[:, None, :], num.shape
            )
        else:
            WH_den = jnp.maximum(WH, EPSILON) if beta - 1.0 < 0 else WH
            den = jnp.einsum(
                "bng,bgk->bnk",
                jnp.power(WH_den, beta - 1.0),
                Htb,
                preferred_element_type=dtype, precision=prec,
            )
        return carry, (num, den)

    _, (nums, dens) = jax.lax.scan(one_chunk, None, (Wc, Htc))
    num = nums.reshape(-1, *nums.shape[2:])[:B]
    den = dens.reshape(-1, *dens.shape[2:])[:B]
    return num, den


def _mu_update_h(X, W, Ht, beta: float, gamma: float,
                 l1_reg: float, l2_reg: float, chunk: int,
                 use_pallas: bool = False, precision=None):
    dtype = W.dtype
    if beta == 2:
        numerator = _shared_xt_dot(X, W)
        WtW = jnp.einsum("bnk,bnl->bkl", W, W, preferred_element_type=dtype, precision=MATMUL_PRECISION)
        denominator = jnp.einsum("bgk,bkl->bgl", Ht, WtW, preferred_element_type=dtype, precision=MATMUL_PRECISION)
    elif beta == 1 and use_pallas:
        from cnmf_tpu.ops.pallas_mu import kl_mu_h_numerator

        numerator = kl_mu_h_numerator(X, W, Ht)
        w_sum = jnp.sum(W, axis=1)  # (B, K)
        w_sum = jnp.where(w_sum == 0, 1.0, w_sum)
        denominator = jnp.broadcast_to(w_sum[:, None, :], numerator.shape)
    elif use_pallas:
        from cnmf_tpu.ops.pallas_mu import beta_mu_h_terms

        numerator, denominator = beta_mu_h_terms(X, W, Ht, beta)
    else:
        numerator, denominator = _mu_h_terms_chunked(X, W, Ht, beta, chunk,
                                                     precision=precision)

    if l1_reg > 0:
        denominator = denominator + l1_reg
    if l2_reg > 0:
        denominator = denominator + l2_reg * Ht
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    delta = numerator / denominator
    if gamma != 1.0:
        delta = jnp.power(delta, gamma)
    return Ht * delta


def _mu_h_terms_chunked(X, W, Ht, beta: float, chunk: int, precision=None):
    prec = precision or MATMUL_PRECISION
    B = W.shape[0]
    dtype = W.dtype
    pad = (-B) % chunk
    Wp = jnp.pad(W, ((0, pad), (0, 0), (0, 0)))
    Htp = jnp.pad(Ht, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (B + pad) // chunk
    Wc = Wp.reshape(n_chunks, chunk, *W.shape[1:])
    Htc = Htp.reshape(n_chunks, chunk, *Ht.shape[1:])

    def one_chunk(carry, inp):
        Wb, Htb = inp
        WH = jnp.einsum("bnk,bgk->bng", Wb, Htb, preferred_element_type=dtype, precision=prec)
        WH_num = jnp.maximum(WH, EPSILON) if beta - 2.0 < 0 else WH
        if beta == 1:
            ratio = X[None] / WH_num
        elif beta == 0:
            ratio = X[None] / (WH_num * WH_num)
        else:
            ratio = X[None] * jnp.power(WH_num, beta - 2.0)
        num = jnp.einsum("bng,bnk->bgk", ratio, Wb, preferred_element_type=dtype, precision=prec)
        if beta == 1:
            w_sum = jnp.sum(Wb, axis=1)  # (chunk, K)
            w_sum = jnp.where(w_sum == 0, 1.0, w_sum)
            den = jnp.broadcast_to(w_sum[:, None, :], num.shape)
        else:
            WH_den = jnp.maximum(WH, EPSILON) if beta - 1.0 < 0 else WH
            den = jnp.einsum(
                "bng,bnk->bgk",
                jnp.power(WH_den, beta - 1.0),
                Wb,
                preferred_element_type=dtype, precision=prec,
            )
        return carry, (num, den)

    _, (nums, dens) = jax.lax.scan(one_chunk, None, (Wc, Htc))
    num = nums.reshape(-1, *nums.shape[2:])[:B]
    den = dens.reshape(-1, *dens.shape[2:])[:B]
    return num, den


@functools.partial(
    jax.jit,
    static_argnames=(
        "beta", "tol", "max_iter", "update_H", "l1_reg_W", "l1_reg_H",
        "l2_reg_W", "l2_reg_H", "chunk", "use_pallas", "precision",
    ),
)
def nmf_multiplicative_update(
    X: jax.Array,
    W0: jax.Array,
    Ht0: jax.Array,
    *,
    beta: float = 2.0,
    tol: float = 1e-4,
    max_iter: int = 200,
    update_H: bool = True,
    l1_reg_W: float = 0.0,
    l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0,
    l2_reg_H: float = 0.0,
    chunk: int = 8,
    use_pallas: bool = False,
    precision: str = None,
    error_init0: jax.Array = None,
    prev_error0: jax.Array = None,
    done0: jax.Array = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched beta-divergence NMF via multiplicative updates.

    beta: 2 = frobenius, 1 = kullback-leibler, 0 = itakura-saito.
    Convergence: every 10 iterations, stop the restarts whose relative error
    improvement (previous_error - error) / error_at_init < tol.
    ``precision``: per-program matmul precision override for the beta != 2
    contractions (the MU precision ladder's coarse phase) — None = the
    module MATMUL_PRECISION; beta == 2 and Pallas branches ignore it.
    ``error_init0``/``prev_error0``: (B,) overrides for the stopping rule's
    denominator and previous-error state — the precision ladder's finishing
    phase passes the ORIGINAL init error and the coarse phase's final error
    so sklearn's criterion continues across the phase boundary instead of
    restarting against an already-converged (tiny) denominator. ``done0``:
    (B,) bool — restarts entering already-stopped (the ladder marks the
    coarse phase's max_iter exhaustions so no restart exceeds sklearn's
    sweep budget by more than one check block).
    """
    B = W0.shape[0]
    dtype = W0.dtype
    eps64 = float(np.finfo(np.float64).eps)

    if beta < 1:
        gamma = 1.0 / (2.0 - beta)
    elif beta > 2:
        gamma = 1.0 / (beta - 1.0)
    else:
        gamma = 1.0

    error_init = (
        error_init0 if error_init0 is not None
        else beta_divergence_error(X, W0, Ht0, beta, chunk, use_pallas,
                                   precision=precision)
    )

    def cond(state):
        it, done, *_ = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(jnp.all(done)))

    def body(state):
        it, done, W, Ht, prev_error, n_iter = state
        W_new = _mu_update_w(X, W, Ht, beta, gamma, l1_reg_W, l2_reg_W, chunk,
                             use_pallas, precision=precision)
        if beta < 1:
            W_new = jnp.where(W_new < eps64, 0.0, W_new)
        if update_H:
            Ht_new = _mu_update_h(X, W_new, Ht, beta, gamma, l1_reg_H,
                                  l2_reg_H, chunk, use_pallas,
                                  precision=precision)
            if beta <= 1:
                Ht_new = jnp.where(Ht_new < eps64, 0.0, Ht_new)
        else:
            Ht_new = Ht

        keep = jnp.logical_not(done)
        W = jnp.where(keep[:, None, None], W_new, W)
        Ht = jnp.where(keep[:, None, None], Ht_new, Ht)
        n_iter = jnp.where(keep, it + 1, n_iter)
        it = it + 1

        def check(args):
            done, prev_error = args
            error = beta_divergence_error(X, W, Ht, beta, chunk, use_pallas,
                                          precision=precision).astype(dtype)
            newly_done = (prev_error - error) / jnp.maximum(error_init, EPSILON) < tol
            return jnp.logical_or(done, newly_done), error

        if tol > 0:
            done, prev_error = jax.lax.cond(
                it % 10 == 0, check, lambda a: a, (done, prev_error)
            )
        return it, done, W, Ht, prev_error, n_iter

    state0 = (
        jnp.zeros((), jnp.int32),
        (done0 if done0 is not None else jnp.zeros((B,), jnp.bool_)),
        W0,
        Ht0,
        (prev_error0 if prev_error0 is not None else error_init)
        .astype(dtype),
        jnp.zeros((B,), jnp.int32),
    )
    _, _, W, Ht, _, n_iter = jax.lax.while_loop(cond, body, state0)
    return W, Ht, n_iter


_beta_div_err_jit = functools.partial(
    jax.jit,
    static_argnames=("beta", "chunk", "use_pallas", "precision"),
)(beta_divergence_error)


def nmf_mu_precision_ladder(
    X, W0, Ht0, *, beta, tol=1e-4, max_iter=200, update_H=True,
    l1_reg_W=0.0, l1_reg_H=0.0, l2_reg_W=0.0, l2_reg_H=0.0, chunk=8,
    use_pallas_finish=False, coarse_precision="default",
    finish_precision=None,
):
    """Two-phase MU for beta != 2: COARSE sweeps at a cheap matmul
    precision until the sklearn stopping rule fires, then re-converge at
    the parity precision from the coarse factors (round-5 VERDICT #3).

    Motivation: at K=16 the per-restart thin-K contractions cap the MXU at
    K/128; 'default' (1-pass bf16) measured ~4.5x the per-sweep throughput
    of 'highest' (6-pass) but drifts ~3e-3 — outside the 1e-4 contract.
    MU warm-starts are well-posed (the update is a fixed-point iteration
    contracting toward the same stationary point), so the coarse phase
    buys cheap progress and the finishing phase restores the contract: it
    CONTINUES sklearn's stopping rule across the phase boundary — the
    denominator stays the original-init error (computed once at the
    finishing precision) and prev_error enters as the coarse factors'
    error, so the finish stops exactly when the from-scratch solve's
    criterion would. n_iter returns the SUM of both phases' sweeps.

    Two programs per (shape, config) instead of one — the phase boundary
    is a host dispatch, no d→h transfer (factors stay device-resident).
    Exactness contract: final factors agree with the single-precision
    solve to the finishing rule's convergence level, NOT bitwise — gated
    behind CNMF_TPU_MU_PRECISION_LADDER (measured A/B in TODO.md).
    Reference semantics: cnmf.py:618-627 (beta_loss dispatch to sklearn
    MU)."""
    err_init = _beta_div_err_jit(
        X, W0, Ht0, beta, chunk, use_pallas_finish,
        precision=finish_precision,
    )
    W1, Ht1, n1 = nmf_multiplicative_update(
        X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
        update_H=update_H, l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H, chunk=chunk,
        use_pallas=False, precision=coarse_precision,
    )
    prev = _beta_div_err_jit(
        X, W1, Ht1, beta, chunk, use_pallas_finish,
        precision=finish_precision,
    )
    W2, Ht2, n2 = nmf_multiplicative_update(
        X, W1, Ht1, beta=beta, tol=tol, max_iter=max_iter,
        update_H=update_H, l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H, chunk=chunk,
        use_pallas=use_pallas_finish, precision=finish_precision,
        error_init0=err_init, prev_error0=prev,
        # a coarse-phase max_iter exhaustion stops here too — sklearn's
        # sweep budget, not a second one
        done0=(n1 >= max_iter),
    )
    return W2, Ht2, n1 + n2


@functools.partial(
    jax.jit,
    static_argnames=(
        "beta", "tol", "max_iter", "ladder",
        "l1_reg_W", "l1_reg_H", "l2_reg_W", "l2_reg_H",
        "chunk", "use_pallas",
    ),
)
def nmf_mu_device_ladder(
    X, W0, Ht0, *, beta: float = 2.0, tol: float = 1e-4,
    max_iter: int = 200, ladder: tuple = (),
    l1_reg_W: float = 0.0, l1_reg_H: float = 0.0,
    l2_reg_W: float = 0.0, l2_reg_H: float = 0.0,
    chunk: int = 8, use_pallas: bool = False,
):
    """Batched MU with on-device ladder compaction — the MU twin of
    ``nmf_cd_device_ladder`` (same while_loop cascade / argsort re-pack /
    output scatter; see that docstring for the schedule design). MU
    convergence state (``prev_error``, ``error_init``) rides the re-pack
    gathers; the every-10-sweeps error check uses the global sweep counter,
    so check cadence is identical to ``nmf_multiplicative_update`` and the
    results match it exactly at f64 (tests/test_device_ladder.py). At the
    KL bench config the restart distribution is mean 104 / max 200 sweeps —
    ~1.9x executed-FLOP headroom for the shrinking batch.

    Returns ``(spectra (B0, K, G), n_iter (B0,), stage_sweeps)``.
    """
    dtype = W0.dtype
    B0, N, K = W0.shape
    G = X.shape[1]
    eps64 = float(np.finfo(np.float64).eps)
    if beta < 1:
        gamma = 1.0 / (2.0 - beta)
    elif beta > 2:
        gamma = 1.0 / (beta - 1.0)
    else:
        gamma = 1.0

    if not ladder:
        ladder = (B0,)
    assert ladder[0] >= B0 and all(
        a > b for a, b in zip(ladder, ladder[1:])
    ), ladder
    pad = ladder[0] - B0
    W = jnp.concatenate([W0, jnp.repeat(W0[:1], pad, axis=0)]) if pad else W0
    Ht = (
        jnp.concatenate([Ht0, jnp.repeat(Ht0[:1], pad, axis=0)])
        if pad else Ht0
    )
    Bp = ladder[0]
    done = jnp.arange(Bp) >= B0
    pos = jnp.minimum(jnp.arange(Bp, dtype=jnp.int32), B0)
    out_Ht = jnp.zeros((B0 + 1, K, G), dtype)
    out_n = jnp.zeros(B0 + 1, jnp.int32)

    err_init = beta_divergence_error(X, W, Ht, beta, chunk, use_pallas)
    err_init = err_init.astype(dtype)
    prev_err = err_init
    git = jnp.zeros((), jnp.int32)
    ni = jnp.zeros(Bp, jnp.int32)
    stage_ends = []

    for si, s in enumerate(ladder):
        nxt = ladder[si + 1] if si + 1 < len(ladder) else 0

        def cond(st, nxt=nxt, s=s):
            git, W, Ht, prev_err, e0, ni, done, pos = st
            alive = s - jnp.sum(done)
            return jnp.logical_and(git < max_iter, alive > nxt)

        def body(st):
            git, W, Ht, prev_err, e0, ni, done, pos = st
            W_new = _mu_update_w(
                X, W, Ht, beta, gamma, l1_reg_W, l2_reg_W, chunk, use_pallas
            )
            if beta < 1:
                W_new = jnp.where(W_new < eps64, 0.0, W_new)
            Ht_new = _mu_update_h(
                X, W_new, Ht, beta, gamma, l1_reg_H, l2_reg_H, chunk,
                use_pallas,
            )
            if beta <= 1:
                Ht_new = jnp.where(Ht_new < eps64, 0.0, Ht_new)

            keep = jnp.logical_not(done)
            W = jnp.where(keep[:, None, None], W_new, W)
            Ht = jnp.where(keep[:, None, None], Ht_new, Ht)
            ni = jnp.where(keep, git + 1, ni)
            git = git + 1

            def check(args):
                done, prev_err = args
                error = beta_divergence_error(
                    X, W, Ht, beta, chunk, use_pallas
                ).astype(dtype)
                newly_done = (
                    (prev_err - error) / jnp.maximum(e0, EPSILON) < tol
                )
                return jnp.logical_or(done, newly_done), error

            if tol > 0:
                done, prev_err = jax.lax.cond(
                    git % 10 == 0, check, lambda a: a, (done, prev_err)
                )
            return git, W, Ht, prev_err, e0, ni, done, pos

        git, W, Ht, prev_err, err_init, ni, done, pos = jax.lax.while_loop(
            cond, body, (git, W, Ht, prev_err, err_init, ni, done, pos)
        )
        out_Ht = out_Ht.at[pos].set(jnp.swapaxes(Ht, 1, 2))
        out_n = out_n.at[pos].set(ni)
        stage_ends.append(git)
        if nxt:
            order = jnp.argsort(done, stable=True)[:nxt]
            W, Ht = W[order], Ht[order]
            prev_err, err_init = prev_err[order], err_init[order]
            ni, done, pos = ni[order], done[order], pos[order]

    ends = jnp.stack(stage_ends)
    stage_sweeps = jnp.diff(ends, prepend=jnp.zeros(1, ends.dtype))
    return out_Ht[:B0], out_n[:B0], stage_sweeps


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def reconstruction_sse(X: jax.Array, W: jax.Array, H: jax.Array,
                       row_chunk: int = 4096) -> jax.Array:
    """sum((X − W·H)²) computed exactly via row-chunked direct differences.

    Used for the K-selection prediction error (reference cnmf.py:925-930)
    where the gram-trick form would suffer cancellation in float32. Only a
    (row_chunk × G) reconstruction tile is live at a time.
    """
    N = X.shape[0]
    pad = (-N) % row_chunk
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    Wp = jnp.pad(W, ((0, pad), (0, 0)))
    n_chunks = (N + pad) // row_chunk
    Xc = Xp.reshape(n_chunks, row_chunk, X.shape[1])
    Wc = Wp.reshape(n_chunks, row_chunk, W.shape[1])

    def one_chunk(acc, inp):
        Xb, Wb = inp
        diff = Xb - jnp.dot(Wb, H, preferred_element_type=X.dtype, precision=MATMUL_PRECISION)
        return acc + jnp.sum(diff * diff), None

    sse, _ = jax.lax.scan(one_chunk, jnp.zeros((), X.dtype), (Xc, Wc))
    return sse


# ----------------------------------------------------------------------
# fixed-spectra NNLS refits (update_H=False entry points)
# ----------------------------------------------------------------------

def nnls_coordinate_descent(X, H, *, tol=1e-4, max_iter=200,
                            l1_reg_W=0.0, l2_reg_W=0.0):
    """Solve min_{W>=0} ||X - W·H|| with H fixed via CD; W starts at zeros.

    X: (N, G), H: (K, G). Returns W (N, K) and the sweep count. Mirrors the
    reference's refit path (cnmf.py:776-802 → sklearn update_H=False, zeros
    init for the CD solver).
    """
    W0 = jnp.zeros((1, X.shape[0], H.shape[0]), dtype=X.dtype)
    Ht0 = jnp.asarray(H.T, dtype=X.dtype)[None]
    W, _, n_iter = nmf_coordinate_descent(
        X, W0, Ht0, tol=tol, max_iter=max_iter, update_H=False,
        l1_reg_W=l1_reg_W, l2_reg_W=l2_reg_W,
    )
    return W[0], int(n_iter[0])


def nnls_multiplicative_update(X, H, *, beta=1.0, tol=1e-4, max_iter=200,
                               l1_reg_W=0.0, l2_reg_W=0.0, chunk=8):
    """Fixed-H NNLS via MU; W starts at sqrt(X.mean()/K) (sklearn 'mu' rule)."""
    K = H.shape[0]
    avg = jnp.sqrt(jnp.mean(X) / K)
    W0 = jnp.full((1, X.shape[0], K), avg, dtype=X.dtype)
    Ht0 = jnp.asarray(H.T, dtype=X.dtype)[None]
    W, _, n_iter = nmf_multiplicative_update(
        X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter, update_H=False,
        l1_reg_W=l1_reg_W, l2_reg_W=l2_reg_W, chunk=chunk,
    )
    return W[0], int(n_iter[0])
