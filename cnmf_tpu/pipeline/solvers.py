"""Solver dispatch: sklearn-style NMF kwargs → batched device kernels.

The pipeline persists one YAML kwargs dict per run (same keys as the
reference's sklearn kwargs, cnmf.py:618-631) and every stage reconstructs its
solver from it. This module maps that dict onto the JAX kernels in
``cnmf_tpu.ops.nmf``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_tpu.ops.init import nnls_w_init
from cnmf_tpu.ops.nmf import (
    MATMUL_PRECISION,
    _ladder,
    fixed_factor_gram,
    fixed_factor_product_transposed,
    nmf_cd_device_ladder,
    nmf_mu_device_ladder,
    nmf_cd_grid,
    nmf_cd_staged,
    nmf_coordinate_descent,
    nmf_coordinate_descent_compacted,
    nmf_multiplicative_update,
    nnls_cd_fixed_spectra,
    nnls_cd_from_products,
)

BETA_LOSS = {"frobenius": 2.0, "kullback-leibler": 1.0, "itakura-saito": 0.0}


def beta_loss_to_float(beta_loss) -> float:
    if isinstance(beta_loss, str):
        return BETA_LOSS[beta_loss]
    return float(beta_loss)


def compute_regularization(
    alpha_W: float, alpha_H, l1_ratio: float, shape
) -> Tuple[float, float, float, float]:
    """sklearn _compute_regularization scaling: W-regs scale with n_features,
    H-regs with n_samples."""
    n_samples, n_features = shape
    if alpha_H == "same" or alpha_H is None:
        alpha_H = alpha_W
    l1_reg_W = n_features * alpha_W * l1_ratio
    l1_reg_H = n_samples * alpha_H * l1_ratio
    l2_reg_W = n_features * alpha_W * (1.0 - l1_ratio)
    l2_reg_H = n_samples * alpha_H * (1.0 - l1_ratio)
    return float(l1_reg_W), float(l1_reg_H), float(l2_reg_W), float(l2_reg_H)


def mu_pallas_eligible(beta: float, dtype, allow_sharded: bool = False,
                       shape=None) -> bool:
    """Whether the fused Pallas MU kernels apply (TPU backend, f32, beta≠2).

    ``CNMF_TPU_PALLAS``: '0' = never, 'force' = whenever the base gates
    pass, '1' (default) = AUTO. The auto rule follows the measured round-4
    speed/precision matrix at the bench shapes (B=100, N=2700, G=2000,
    K=16; W+H sweep TFLOP/s):

    ==========  ========  =====
    precision   pallas    XLA
    ==========  ========  =====
    'high'      3.68      4.73   → XLA (Mosaic has no 3-pass mode; its
                                    HIGHEST costs the full 6-pass)
    'highest'   3.68      3.59   → Pallas (ties on speed, and keeps the
                                    (chunk, N, G) reconstruction out of HBM)
    'default'   9.38      11.09  → XLA
    ==========  ========  =====

    plus a MEMORY override: when the XLA path's chunked (8, N, G)
    reconstruction would exceed ~2 GB of HBM (atlas-scale MU), the Pallas
    fusion applies regardless of precision — pass ``shape=(N, G)`` to
    enable that check.

    ``pallas_call`` has no GSPMD partitioning rule, so on a multi-device
    backend the kernels only apply per shard INSIDE shard_map — those call
    sites pass ``allow_sharded=True``; everywhere else (fused consensus,
    k-stats, plain refits, whose operands may carry cell-sharded
    NamedShardings) multi-device disables Pallas."""
    env = os.environ.get("CNMF_TPU_PALLAS", "1")
    if env == "0":
        return False
    base = (
        beta != 2.0
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and (allow_sharded or jax.device_count() == 1)
    )
    if not base:
        return False
    if env == "force":
        return True
    if shape is not None and 8 * shape[0] * shape[1] * 4 > 2e9:
        return True
    return MATMUL_PRECISION == "highest"


def cd_pallas_eligible(shape, dtype) -> bool:
    """Whether the fused Pallas CD half-sweep kernels (ops/pallas_cd.py)
    apply. OPT-IN (CNMF_TPU_PALLAS_CD=1): measured 5x SLOWER than the XLA
    CD path on the current relay-attached v5e (4.07s vs 0.74s for the
    K=16-bucket 200-sweep batch) — the (tile × restart) grid is
    latency-bound and the XLA solver is already transfer-bound, not
    HBM-bound, at PBMC scale. Kept for re-evaluation on directly-attached
    chips. Also requires: TPU backend, f32, single device (pallas_call has
    no GSPMD partitioning rule), and a data matrix whose H-kernel X
    column-tile — which carries the full row dimension — fits VMEM."""
    n_rows, n_cols = shape
    if not (
        os.environ.get("CNMF_TPU_PALLAS_CD", "0") == "1"
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and jax.device_count() == 1
        and n_cols <= 16384
    ):
        return False
    # the H-kernel X tile is (padded_rows × tile_cols>=128): bound rows by
    # the actual VMEM block budget, not a loose constant — plan_tiles floors
    # tile_cols at 128, so rows beyond budget/(128·4B) would blow VMEM at
    # compile time despite passing a naive 16384 gate
    from cnmf_tpu.ops.pallas_cd import _VMEM_BLOCK_BUDGET

    return n_rows <= _VMEM_BLOCK_BUDGET // (128 * 4)


def solve_nmf_batch(
    X: jax.Array,
    W0: jax.Array,
    Ht0: jax.Array,
    nmf_kwargs: dict,
    update_H: bool = True,
    mu_chunk: int = 8,
    compact: bool = False,
    allow_pallas: bool = True,
    reg_shape: Tuple[int, int] = None,
) -> Tuple[jax.Array, jax.Array, np.ndarray]:
    """Run the batched solver described by sklearn-style kwargs.

    X: (N, G); W0: (B, N, K); Ht0: (B, G, K). Returns (W, Ht, n_iter).
    ``compact``: drop converged restarts from the batch between 125-sweep
    segments (CD only) — saves the tail cost of slow-converging restarts.
    ``reg_shape``: the REAL (n_samples, n_features) for sklearn's
    regularization scaling when X carries zero-padded rows for even mesh
    shards (defaults to X.shape).
    """
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    solver = nmf_kwargs.get("solver", "cd")
    tol = float(nmf_kwargs.get("tol", 1e-4))
    max_iter = int(nmf_kwargs.get("max_iter", 200))
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        reg_shape if reg_shape is not None else X.shape,
    )
    if solver == "cd":
        if beta != 2.0:
            raise ValueError("CD solver supports frobenius loss only")
        if not update_H:
            # fixed-spectra refit → products-distilled half-sweep loop
            # (see ops.nmf.nnls_cd_fixed_spectra)
            W0 = jnp.asarray(W0)
            Ht0 = jnp.asarray(Ht0)
            W, n_iter = nnls_cd_fixed_spectra(
                X, Ht0, W0, tol=tol, max_iter=max_iter,
                l1_reg=l1_reg_W, l2_reg=l2_reg_W,
            )
            return W, Ht0, n_iter
        if compact:
            return nmf_coordinate_descent_compacted(
                X, np.asarray(W0), np.asarray(Ht0), tol=tol, max_iter=max_iter,
                update_H=update_H,
                l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            )
        return nmf_coordinate_descent(
            X, W0, Ht0, tol=tol, max_iter=max_iter, update_H=update_H,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            use_pallas=(
                allow_pallas
                and cd_pallas_eligible(X.shape, jnp.asarray(W0).dtype)
            ),
        )
    # Fused Pallas kernels keep the N×G reconstruction in VMEM for the
    # beta != 2 losses on TPU (the XLA path materializes it in HBM chunk by
    # chunk). Disabled under the sharded mesh path — pallas_call has no GSPMD
    # partitioning rule.
    use_pallas = allow_pallas and mu_pallas_eligible(
        beta, jnp.asarray(W0).dtype, shape=X.shape
    )
    if update_H and mu_precision_ladder_enabled():
        # CNMF_TPU_MU_PRECISION_LADDER: coarse bf16-level sweeps then a
        # parity-precision re-convergence (ops.nmf.nmf_mu_precision_ladder,
        # round-5 VERDICT #3)
        from cnmf_tpu.ops.nmf import nmf_mu_precision_ladder

        return nmf_mu_precision_ladder(
            X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
            update_H=update_H, l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H, chunk=mu_chunk,
            use_pallas_finish=use_pallas,
        )
    return nmf_multiplicative_update(
        X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter, update_H=update_H,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H, chunk=mu_chunk,
        use_pallas=use_pallas,
    )


def mu_precision_ladder_enabled() -> bool:
    """Resolve the CNMF_TPU_MU_PRECISION_LADDER knob: '1' runs beta != 2
    factorize solves as (coarse 'default'-precision sweeps → parity-
    precision finish); default '0' pending the on-chip A/B (TODO.md) —
    the contract holds factors to the finishing rule's convergence level,
    not bitwise."""
    return os.environ.get("CNMF_TPU_MU_PRECISION_LADDER", "0") == "1"


def solve_nmf_grid(X, W0, Ht0, nmf_kwargs: dict,
                   seg_len: int = 125, min_bucket: int = 32):
    """Tail-compacted CD over a MERGED restart batch (all restarts sharing
    one padded component count, across K values) — see ops.nmf.nmf_cd_grid.
    Returns (spectra (B, pad_k, G) host, n_iter (B,) host). CD/frobenius
    only; callers fall back to solve_nmf_batch otherwise."""
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    if solver != "cd" or beta != 2.0:
        raise ValueError("solve_nmf_grid is CD/frobenius only")
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    return nmf_cd_grid(
        X, W0, Ht0,
        tol=float(nmf_kwargs.get("tol", 1e-4)),
        max_iter=int(nmf_kwargs.get("max_iter", 200)),
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        seg_len=seg_len, min_bucket=min_bucket,
    )


def device_init_enabled() -> bool:
    """Resolve the CNMF_TPU_DEVICE_INIT knob: '0' restores the
    sklearn-bit-identical host draw, 'force' enables the device (threefry)
    init on any backend (tests / CPU dryruns), '1' (default) enables it on
    the TPU backend — where the host path would ship ~270 MB of noise per
    run over the relay link."""
    env = os.environ.get("CNMF_TPU_DEVICE_INIT", "1")
    if env == "0":
        return False
    if env == "force":
        return True
    return env == "1" and jax.default_backend() == "tpu"


def device_kmeanspp_enabled() -> bool:
    """Resolve the CNMF_TPU_DEVICE_KMEANSPP knob: '0' keeps the host greedy
    kmeans++ (numpy RandomState stream, the sklearn-scheme seeding consensus
    has used since round 3), 'force' enables the ON-DEVICE threefry-keyed
    seeding on any backend (tests / CPU dryruns), '1' (default) enables it
    on the TPU backend — where the host seeding forces a device→host→device
    synchronization mid-consensus (KNN density drain → host kmeans++ →
    chain dispatch) plus one extra cold compile (~4.7 s census). Same
    greedy n_local_trials scheme either way; SURVEY §2.10 sanctions the JAX
    PRNG stream standing in for the numpy one."""
    env = os.environ.get("CNMF_TPU_DEVICE_KMEANSPP", "1")
    if env == "0":
        return False
    if env == "force":
        return True
    return env == "1" and jax.default_backend() == "tpu"


def device_spectra_enabled() -> bool:
    """Resolve the CNMF_TPU_DEVICE_SPECTRA knob: '1' (default) lets the
    full-fused consensus consume the DEVICE-RESIDENT packed true-K spectra a
    same-process factorize left behind (L2 normalization inside the program)
    on the TPU backend, instead of re-uploading the host merged copy
    (~8 MB/K at bench scale over a ~32 MB/s link) — and, under
    CNMF_TPU_ASYNC_WRITES=1, lets factorize defer the packed spectra drain
    to the background writer so the d→h transfer (the bulk of solve_wait:
    measured 1.6 s device vs 2.3-11 s drain at 64.8 MB) overlaps
    combine/consensus. 'force' enables it on any backend (tests / CPU
    dryruns), '0' restores the host-normalized upload everywhere. The
    device L2 normalization reorders the norm reduction (~1e-7 relative on
    f32 inputs; exact at f64), inside the 1e-4 consensus contract."""
    env = os.environ.get("CNMF_TPU_DEVICE_SPECTRA", "1")
    if env == "0":
        return False
    if env == "force":
        return True
    return env == "1" and jax.default_backend() == "tpu"


def solve_nmf_sharded_device(
    mesh, X, seeds, x_mean: float, k: int, pad_k: int, nmf_kwargs: dict,
    min_bucket: int = 16, mu_chunk: int = 8,
):
    """Multi-device factorize with ON-DEVICE init + ladder compaction:
    ONE shard_map program per pad bucket, where only the replicate seed
    vector crosses the host link (SURVEY §2.5 — 'factorize is one device
    program' now holds on the mesh too; the round-2/3 link-byte wins were
    single-device-gated before round 4).

    Restart-axis meshes only (``mesh.shape['cell'] == 1``): each device
    draws its local restart slice's init from the per-restart seeds (the
    draw is seed-keyed and partition-independent — ops.init.draw_init_batch)
    and runs the ladder on that slice independently; X is replicated, so no
    collectives run during the solve. Exact per restart: the ladder is
    restart-separable, and at f64 its factors match the plain batched
    solver bit-for-bit regardless of the local schedule
    (tests/test_sharding.py pins mesh == single-device at f64).

    Returns ``(spectra (B, pad_k, G) restart-sharded fetch layout,
    n_iter (B,), (ladder, stage_sweeps (n_stages,) summed over shards))``.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnmf_tpu.ops.init import draw_init_batch
    from cnmf_tpu.parallel.mesh import pad_to_multiple

    if mesh.shape["cell"] != 1:
        raise ValueError("solve_nmf_sharded_device is restart-axis only")
    n_restart = mesh.shape["restart"]
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    tol = float(nmf_kwargs.get("tol", 1e-4))
    max_iter = int(nmf_kwargs.get("max_iter", 200))
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    dtype = jnp.dtype(X.dtype)
    seeds_p, true_b = pad_to_multiple(
        np.asarray(seeds, dtype=np.uint32), n_restart
    )
    b_local = len(seeds_p) // n_restart
    ladder = tuple(_ladder(b_local, min_bucket))
    avg = np.dtype(dtype).type(np.sqrt(x_mean / k))
    kmask = (np.arange(pad_k) < k).astype(dtype)
    use_pallas = mu_pallas_eligible(beta, dtype, allow_sharded=True,
                                    shape=X.shape)
    n, g = X.shape

    def local(Xl, seeds_l, avg_l, kmask_l):
        W0, Ht0 = draw_init_batch(
            seeds_l, avg_l, kmask_l, n=n, g=g, pad_k=pad_k, dt=dtype
        )
        if solver == "cd":
            if beta != 2.0:
                raise ValueError("CD solver supports frobenius loss only")
            spec, n_it, sweeps = nmf_cd_device_ladder(
                Xl, W0, Ht0, tol=tol, max_iter=max_iter, ladder=ladder,
                l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            )
        else:
            spec, n_it, sweeps = nmf_mu_device_ladder(
                Xl, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
                ladder=ladder,
                l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                chunk=mu_chunk, use_pallas=use_pallas,
            )
        return spec, n_it, sweeps[None]

    rspec = P("restart", None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("restart"), P(), P()),
        out_specs=(rspec, P("restart"), P("restart", None)),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    # factorize pre-replicates X once across the mesh; only re-place when a
    # caller hands in something else (a per-K re-broadcast costs a full ICI
    # pass each)
    Xd = X if getattr(X, "sharding", None) == repl else jax.device_put(X, repl)
    seeds_d = jax.device_put(
        seeds_p, NamedSharding(mesh, P("restart"))
    )
    spec, n_iter, stage_sweeps = jax.jit(fn)(
        Xd, seeds_d, jnp.asarray(avg, dtype), jnp.asarray(kmask)
    )
    return spec[:true_b], n_iter[:true_b], (ladder, stage_sweeps.sum(axis=0))


def solve_nmf_batch_sharded_seeded(
    mesh, X, seeds, x_mean: float, k: int, pad_k: int, nmf_kwargs: dict,
    mu_chunk: int = 8, n_cells: int = None,
):
    """Cell-sharded mesh factorize with ON-DEVICE init: the GSPMD twin of
    ``solve_nmf_sharded_device`` for meshes with ``cell > 1`` (including
    restart × cell), closing the last host-noise upload — atlas configs on a
    real pod shard the cell axis, and the host init would re-ship ~270 MB of
    noise per run over the link (round-4 VERDICT #1).

    ONE jit program: the threefry init draw (partition-independent —
    ``jax_threefry_partitionable`` makes the counter-based bits identical
    under any GSPMD partitioning, pinned by tests/test_sharded_device.py)
    constrained to the factorize shardings (W rows follow X's cell shards,
    Ht replicated over cell), then the plain batched solver — GSPMD inserts
    the psum'd XᵀW/WᵀW reductions over the cell axis from the sharding
    annotations (SURVEY §2.5-2.6). The ladder's argsort re-pack would
    shuffle restart shards across devices mid-solve, so cell-sharded meshes
    keep the plain schedule (same trade the GSPMD host-init path made).

    X's rows zero-pad to the cell-shard multiple (committed arrays need
    even shards); the matching W rows are masked to zero at init and stay
    exactly zero through both solvers (CD: grad = W·HHt − XHt = 0 on a zero
    row, so the projected gradient contributes nothing; MU: multiplicative
    updates keep zeros), so padding is exactly neutral. The threefry draw's
    prefix property (bits depend on the flat element index only) makes the
    padded draw's real rows bit-identical to an unpadded draw. Pass
    ``n_cells`` when X arrives pre-padded — it sets the real row count for
    sklearn's regularization scaling and the returned W slice.

    Returns ``(W (true_b, n_cells, pad_k), Ht, n_iter)`` sliced back to the
    true restart count — same contract as ``solve_nmf_batch_sharded``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnmf_tpu.ops.init import draw_init_batch
    from cnmf_tpu.parallel.mesh import pad_to_multiple

    n_restart = mesh.shape["restart"]
    n_cell = mesh.shape["cell"]
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    if solver == "cd" and beta != 2.0:
        raise ValueError("CD solver supports frobenius loss only")
    tol = float(nmf_kwargs.get("tol", 1e-4))
    max_iter = int(nmf_kwargs.get("max_iter", 200))
    n_in, g = X.shape
    n_real = n_in if n_cells is None else int(n_cells)
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        (n_real, g),
    )
    dtype = jnp.dtype(X.dtype)
    seeds_p, true_b = pad_to_multiple(
        np.asarray(seeds, dtype=np.uint32), n_restart
    )
    avg = np.dtype(dtype).type(np.sqrt(x_mean / k))
    kmask = (np.arange(pad_k) < k).astype(dtype)

    pad_rows = (-n_in) % n_cell
    if pad_rows:
        X = (jnp.pad(X, ((0, pad_rows), (0, 0)))
             if isinstance(X, jax.Array)
             else np.pad(np.asarray(X), ((0, pad_rows), (0, 0))))
    n_tot = n_in + pad_rows

    x_sh = NamedSharding(mesh, P("cell", None))
    jitted = _gspmd_seeded_program(
        mesh, n_tot, n_real, g, pad_k, dtype, solver, beta, tol, max_iter,
        l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H, mu_chunk,
    )
    # factorize pre-places X cell-sharded once across the Ks; only re-place
    # when a caller hands in something else
    Xd = X if getattr(X, "sharding", None) == x_sh else jax.device_put(X, x_sh)
    seeds_d = jax.device_put(seeds_p, NamedSharding(mesh, P("restart")))
    W, Ht, n_iter = jitted(
        Xd, seeds_d, jnp.asarray(avg, dtype), jnp.asarray(kmask)
    )
    return W[:true_b, :n_real], Ht[:true_b], n_iter[:true_b]


@functools.lru_cache(maxsize=32)
def _gspmd_seeded_program(
    mesh, n_tot, n_real, g, pad_k, dtype, solver, beta, tol, max_iter,
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H, mu_chunk,
):
    """Cached jit of the (init draw → constrained shardings → batched solve)
    program — a fresh closure per call would miss jax's python-level jit
    cache and re-trace every (K, chunk) dispatch. Keyed by the mesh object
    (hashable) and the full traced config. ``n_tot`` is the cell-padded row
    count the draw and solve run at; rows past ``n_real`` get zero W inits
    (exactly neutral, see solve_nmf_batch_sharded_seeded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnmf_tpu.ops.init import draw_init_batch

    w_sh = NamedSharding(mesh, P("restart", "cell", None))
    h_sh = NamedSharding(mesh, P("restart", None, None))

    def fn(Xd, seeds_d, avg_d, kmask_d):
        W0, Ht0 = draw_init_batch(
            seeds_d, avg_d, kmask_d, n=n_tot, g=g, pad_k=pad_k, dt=dtype
        )
        if n_tot > n_real:
            rowmask = (jnp.arange(n_tot) < n_real).astype(dtype)
            W0 = W0 * rowmask[None, :, None]
        W0 = jax.lax.with_sharding_constraint(W0, w_sh)
        Ht0 = jax.lax.with_sharding_constraint(Ht0, h_sh)
        if solver == "cd":
            return nmf_coordinate_descent(
                Xd, W0, Ht0, tol=tol, max_iter=max_iter,
                l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            )
        return nmf_multiplicative_update(
            Xd, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            chunk=mu_chunk, use_pallas=False,
        )

    return jax.jit(fn)


def device_ladder_enabled() -> bool:
    """Resolve the CNMF_TPU_DEVICE_LADDER knob: '1' forces the on-device
    ladder everywhere, '0' disables it, unset enables it on the TPU backend
    only (CPU keeps the plain batched solver so f32 factors stay on the
    sklearn-identical trajectory — see tests/test_device_ladder.py)."""
    env = os.environ.get("CNMF_TPU_DEVICE_LADDER", "")
    return env == "1" or (env != "0" and jax.default_backend() == "tpu")


def solve_nmf_batch_ladder(X, W0, Ht0, nmf_kwargs: dict,
                           min_bucket: int = 16, mu_chunk: int = 8,
                           allow_pallas: bool = True):
    """Tail-compacted solve with on-device restart compaction (see
    ops.nmf.nmf_cd_device_ladder / nmf_mu_device_ladder) — the whole
    shrinking-batch schedule is ONE device program, no host control reads.
    Dispatches CD (frobenius) or MU (any beta) by the sklearn-style kwargs.
    Returns ``(spectra (B, pad_k, G) device, n_iter (B,) device, (ladder
    sizes, stage_sweeps device))`` — spectra already in fetch layout; the
    third element feeds executed-FLOP accounting. update_H=True only."""
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    ladder = tuple(_ladder(int(W0.shape[0]), min_bucket))
    tol = float(nmf_kwargs.get("tol", 1e-4))
    max_iter = int(nmf_kwargs.get("max_iter", 200))
    if solver == "cd":
        if beta != 2.0:
            raise ValueError("CD solver supports frobenius loss only")
        spec, n_iter, stage_sweeps = nmf_cd_device_ladder(
            X, W0, Ht0, tol=tol, max_iter=max_iter, ladder=ladder,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        )
    else:
        use_pallas = allow_pallas and mu_pallas_eligible(
            beta, jnp.asarray(W0).dtype, shape=X.shape
        )
        spec, n_iter, stage_sweeps = nmf_mu_device_ladder(
            X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter,
            ladder=ladder,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            chunk=mu_chunk, use_pallas=use_pallas,
        )
    return spec, n_iter, (ladder, stage_sweeps)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad_k", "solver", "beta", "tol", "max_iter", "ladder",
        "l1_reg_W", "l1_reg_H", "l2_reg_W", "l2_reg_H",
        "mu_chunk", "use_pallas",
    ),
)
def _seeded_ladder(
    X, seeds, avg, kmask, *, pad_k, solver, beta, tol, max_iter, ladder,
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H, mu_chunk, use_pallas,
):
    """Device init + ladder as ONE program (single-device twin of
    solve_nmf_sharded_device's local body): the threefry init draw and the
    tail-compacted solve trace into a single XLA executable, so a cold
    start compiles one program per pad bucket instead of two (the separate
    init programs were ~5 s of the ~36 s remote-compile wall) and the warm
    path saves a dispatch + the W0/Ht0 HBM round trip per K. K enters only
    through the traced ``avg``/``kmask`` operands — every K in a pad bucket
    shares this one program."""
    from cnmf_tpu.ops.init import draw_init_batch

    n, g = X.shape
    W0, Ht0 = draw_init_batch(
        seeds, avg, kmask, n=n, g=g, pad_k=pad_k, dt=X.dtype
    )
    if solver == "cd":
        return nmf_cd_device_ladder(
            X, W0, Ht0, tol=tol, max_iter=max_iter, ladder=ladder,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        )
    return nmf_mu_device_ladder(
        X, W0, Ht0, beta=beta, tol=tol, max_iter=max_iter, ladder=ladder,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        chunk=mu_chunk, use_pallas=use_pallas,
    )


def solve_nmf_batch_ladder_seeded(
    X, seeds, x_mean: float, k: int, pad_k: int, nmf_kwargs: dict,
    min_bucket: int = 16, mu_chunk: int = 8, allow_pallas: bool = True,
):
    """Single-device factorize with on-device init fused into the ladder:
    only the replicate seed vector crosses the host link and the whole
    (init → shrinking-batch solve) chain is one dispatch. Same return
    contract as ``solve_nmf_batch_ladder``; factors are bit-identical to
    drawing the init in its own program first (the draw is elementwise and
    seed-keyed — see ops.init.draw_init_batch)."""
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    if solver == "cd" and beta != 2.0:
        raise ValueError("CD solver supports frobenius loss only")
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    ladder = tuple(_ladder(len(seeds), min_bucket))
    dtype = jnp.dtype(X.dtype)
    avg = np.dtype(dtype).type(np.sqrt(x_mean / k))
    kmask = (np.arange(pad_k) < k).astype(dtype)
    use_pallas = (
        allow_pallas and solver != "cd"
        and mu_pallas_eligible(beta, dtype, shape=X.shape)
    )
    spec, n_iter, stage_sweeps = _seeded_ladder(
        X, jnp.asarray(np.asarray(seeds, dtype=np.uint32)),
        jnp.asarray(avg, dtype=dtype), jnp.asarray(kmask),
        pad_k=pad_k, solver=solver, beta=beta,
        tol=float(nmf_kwargs.get("tol", 1e-4)),
        max_iter=int(nmf_kwargs.get("max_iter", 200)),
        ladder=ladder,
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        mu_chunk=mu_chunk, use_pallas=use_pallas,
    )
    return spec, n_iter, (ladder, stage_sweeps)


def solve_nmf_staged(X, inits, nmf_kwargs: dict,
                     s0: int = 250, seg_len: int = 125,
                     min_bucket: int = 32):
    """Two-phase tail-compacted CD over per-K init batches (see
    ops.nmf.nmf_cd_staged): per-K dispatches for the first ``s0`` sweeps,
    then one merged ladder-compacted continuation for the stragglers.
    Returns per-K (spectra (B_k, pad_k, G) host, n_iter) in input order.
    CD/frobenius only."""
    solver = nmf_kwargs.get("solver", "cd")
    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    if solver != "cd" or beta != 2.0:
        raise ValueError("solve_nmf_staged is CD/frobenius only")
    l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        X.shape,
    )
    return nmf_cd_staged(
        X, inits,
        tol=float(nmf_kwargs.get("tol", 1e-4)),
        max_iter=int(nmf_kwargs.get("max_iter", 200)),
        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
        s0=int(os.environ.get("CNMF_TPU_STAGED_S0", s0)),
        seg_len=seg_len, min_bucket=min_bucket,
    )


def solve_nmf_batch_sharded(
    mesh,
    X,
    W0,
    Ht0,
    nmf_kwargs: dict,
    update_H: bool = True,
    mu_chunk: int = 8,
    force_shard_map: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched solve over a (restart, cell) mesh; returns (W, Ht, n_iter)
    sliced back to the true restart count.

    The restart batch pads to the restart-shard multiple (repeating restart
    0 — exact, padded results are discarded). Two partitioning modes:

    * beta != 2 with the fused Pallas kernels eligible and no cell sharding:
      the WHOLE solver runs under ``shard_map`` over the restart axis — each
      device executes the Pallas MU program on its local restart slice. This
      is exact because the MU solver is restart-separable (per-restart
      factors, errors and convergence masks; X replicated), and it is what
      keeps multi-device KL/IS off the HBM-heavy chunked-XLA fallback
      (pallas_call has no GSPMD partitioning rule).
    * otherwise: GSPMD shardings on the inputs and the pure-XLA solver,
      which also covers cell-axis sharding (psum'd XᵀW/WᵀW grams).

    ``force_shard_map`` exercises the shard_map path regardless of Pallas
    eligibility (used by tests, where the CPU backend disqualifies Pallas).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnmf_tpu.parallel.mesh import pad_to_multiple, shard_factorize_inputs

    n_restart = mesh.shape["restart"]
    W0p, true_b = pad_to_multiple(np.asarray(W0), n_restart)
    Ht0p, _ = pad_to_multiple(np.asarray(Ht0), n_restart)
    # X may carry zero-padded rows for even cell shards (factorize pre-pads
    # once for the whole K sweep): give W matching ZERO rows — exactly
    # neutral (CD leaves a zero row of a zero X row untouched; MU keeps
    # zeros) — and slice them back off the result
    n_w_real = W0p.shape[1]
    if X.shape[0] > n_w_real:
        W0p = np.pad(W0p, ((0, 0), (0, X.shape[0] - n_w_real), (0, 0)))

    beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
    solver = nmf_kwargs.get("solver", "cd")
    # per-shard use inside shard_map — the one place multi-device Pallas
    # is legitimate
    use_pallas = mu_pallas_eligible(beta, np.asarray(W0).dtype,
                                    allow_sharded=True, shape=X.shape)
    shmap_ok = (
        solver != "cd" and beta != 2.0 and mesh.shape["cell"] == 1
        and (use_pallas or force_shard_map)
    )
    if shmap_ok:
        from jax import shard_map

        l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
            float(nmf_kwargs.get("alpha_W", 0.0)),
            nmf_kwargs.get("alpha_H", "same"),
            float(nmf_kwargs.get("l1_ratio", 0.0)),
            X.shape,
        )
        fn = functools.partial(
            nmf_multiplicative_update,
            beta=beta,
            tol=float(nmf_kwargs.get("tol", 1e-4)),
            max_iter=int(nmf_kwargs.get("max_iter", 200)),
            update_H=update_H,
            l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
            l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
            chunk=mu_chunk, use_pallas=use_pallas,
        )
        rspec = P("restart", None, None)
        solve = shard_map(
            fn, mesh=mesh,
            in_specs=(P(), rspec, rspec),
            out_specs=(rspec, rspec, P("restart")),
            check_vma=False,
        )
        Xd = jax.device_put(X, NamedSharding(mesh, P()))
        W0d = jax.device_put(W0p, NamedSharding(mesh, rspec))
        Ht0d = jax.device_put(Ht0p, NamedSharding(mesh, rspec))
        W, Ht, n_iter = jax.jit(solve)(Xd, W0d, Ht0d)
        return W[:true_b], Ht[:true_b], n_iter[:true_b]

    Xs, W0d, Ht0d = shard_factorize_inputs(mesh, X, W0p, Ht0p)
    W, Ht, n_iter = solve_nmf_batch(
        Xs, W0d, Ht0d, nmf_kwargs, update_H=update_H, mu_chunk=mu_chunk,
        allow_pallas=False, reg_shape=(n_w_real, X.shape[1]),
    )
    return W[:true_b, :n_w_real], Ht[:true_b], n_iter[:true_b]


def _match_factor_shardings(X, W0, Ht0):
    """Place W/Ht on the data matrix's mesh: W rows follow X rows, Ht rows
    follow X columns (a replicated spec when the dim is unsharded). GSPMD
    then partitions the whole solver program from these annotations — the
    XᵀW/WᵀW grams over a sharded axis become psum reductions."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = getattr(X, "sharding", None)
    if not isinstance(sh, NamedSharding):
        return W0, Ht0
    spec = tuple(sh.spec) + (None,) * (2 - len(sh.spec))
    if spec[0] is None and spec[1] is None:
        return W0, Ht0
    W0 = jax.device_put(W0, NamedSharding(sh.mesh, P(None, spec[0], None)))
    Ht0 = jax.device_put(Ht0, NamedSharding(sh.mesh, P(None, spec[1], None)))
    return W0, Ht0


def refit_spectra_transposed(X, usages, nmf_kwargs, dtype=np.float32,
                             mu_chunk: int = 8, n_cells=None):
    """Fixed-usage spectra refit via the transpose trick (reference
    cnmf.py:805-820, 948-955) WITHOUT materializing Xᵀ: the CD refit only
    consumes the usage gram and the contraction Xᵀ·U, so the (genes × cells)
    copy — 8 GB at the 100k×20k atlas config — never exists in HBM.

    X: (cells × genes) host or device array, possibly cell-padded for even
    mesh sharding (padded usage rows are zero → exactly neutral in both
    products); usages: (cells × k). Returns spectra in X's units, transposed:
    (genes × k). MU solves fall back to the materialized transpose."""
    import scipy.sparse as sp

    solver = nmf_kwargs.get("solver", "cd")
    if solver != "cd":
        if sp.issparse(X):
            raise ValueError(
                "refit_spectra_transposed: sparse X is CD-only — the MU "
                "spectra refit goes through the pipeline's gene-chunked path"
            )
        Xt = X.T if isinstance(X, jax.Array) else np.ascontiguousarray(
            np.asarray(X).T
        )
        return refit_usages(
            Xt, np.ascontiguousarray(usages.T), nmf_kwargs, dtype=dtype,
            mu_chunk=mu_chunk,
        )
    if beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius")) != 2.0:
        raise ValueError("CD solver supports frobenius loss only")
    k = usages.shape[1]
    pad_k = -(-k // 8) * 8
    U = np.ascontiguousarray(usages, dtype=dtype)
    if pad_k > k:
        U = np.pad(U, ((0, 0), (0, pad_k - k)))
    if U.shape[0] < X.shape[0]:
        U = np.pad(U, ((0, X.shape[0] - U.shape[0]), (0, 0)))
    # the reg scaling the materialized-transpose solve would see: its X is
    # (genes × cells) → n_features = the REAL cell count (``n_cells``) —
    # zero-padded mesh rows are neutral in the products but must not
    # inflate alpha scaling (the fused consensus and sklearn both scale by
    # the real count)
    l1_reg_W, _, l2_reg_W, _ = compute_regularization(
        float(nmf_kwargs.get("alpha_W", 0.0)),
        nmf_kwargs.get("alpha_H", "same"),
        float(nmf_kwargs.get("l1_ratio", 0.0)),
        (X.shape[1], int(n_cells) if n_cells is not None else X.shape[0]),
    )
    Ud = jnp.asarray(U)
    gram = fixed_factor_gram(Ud[None])
    if sp.issparse(X):
        # host SpMM: XᵀU in O(nnz·k) — the full-gene TPM never goes dense
        # anywhere, on host or device
        P = jnp.asarray(
            np.ascontiguousarray(np.asarray(X.T @ U), dtype=dtype)
        )[None]
        n_out = X.shape[1]
    else:
        if isinstance(X, jax.Array):
            Xd = X.astype(dtype) if X.dtype != dtype else X
        else:
            Xd = jnp.asarray(np.ascontiguousarray(X, dtype=dtype))
        P = fixed_factor_product_transposed(Ud, Xd)
        n_out = Xd.shape[1]
    W0 = jnp.zeros((1, n_out, pad_k), dtype)
    if sp.issparse(X):
        # over-limit atlas path on a mesh: row-shard the distilled solve
        gram, P, W0, n_out = shard_products_rows(gram, P, W0)
    W, _ = nnls_cd_from_products(
        gram, P, W0, tol=float(nmf_kwargs.get("tol", 1e-4)),
        max_iter=int(nmf_kwargs.get("max_iter", 200)),
        l1_reg=l1_reg_W, l2_reg=l2_reg_W,
    )
    return np.asarray(W[0, :n_out, :k])


def shard_products_rows(gram, P, W0):
    """Mesh placement for the distilled-products refits (the over-limit
    atlas consensus path): shard the (B, M, K) product and W0 along their
    ROW axis over every mesh device and replicate the tiny (B, K, K) gram.

    The products-distilled CD (ops.nmf.nnls_cd_from_products) is row-
    parallel — each W row solves an independent NNLS against the shared
    gram, coupled only through the global violation sum of the stopping
    rule — so under GSPMD the half-sweeps partition cleanly and XLA
    inserts one psum per sweep for the stop test. This is the pod story
    for the >device-limit sparse consensus: the host SpMM products (the
    only O(nnz) work) stream per shard-row block while the M-row solve
    state (1M cells × pad_k at the atlas config) spreads across the
    mesh's HBM (reference contrast: consensus is single-process,
    cnmf.py:823-1082). No-op on a single device;
    ``CNMF_TPU_MESH_PRODUCTS=0`` disables. Equivalence vs the
    single-device solve is psum reduction order only
    (tests/test_sparse_products.py runs this path on the virtual mesh)."""
    n_rows = P.shape[1]
    if (
        len(jax.devices()) == 1
        or os.environ.get("CNMF_TPU_MESH_PRODUCTS", "1") == "0"
    ):
        return gram, P, W0, n_rows
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from cnmf_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    # rows zero-pad to the device multiple (committed arrays need even
    # shards): a zero P row keeps its zero-initialized W row at exactly 0
    # through every half-sweep and adds nothing to the violation sum
    n_dev = len(mesh.devices.flat)
    pad = (-n_rows) % n_dev
    if pad:
        P = jnp.pad(P, ((0, 0), (0, pad), (0, 0)))
        W0 = jnp.pad(W0, ((0, 0), (0, pad), (0, 0)))
    row_sh = NamedSharding(mesh, PS(None, ("restart", "cell"), None))
    rep = NamedSharding(mesh, PS())
    return (
        jax.device_put(gram, rep),
        jax.device_put(P, row_sh),
        jax.device_put(W0, row_sh),
        n_rows,
    )


def refit_usages(
    X,
    spectra: np.ndarray,
    nmf_kwargs: dict,
    dtype=np.float32,
    mu_chunk: int = 8,
    n_rows: int = None,
) -> np.ndarray:
    """Fixed-spectra NNLS usage refit (sklearn update_H=False semantics):
    W init zeros for CD, sqrt(X.mean()/K) for MU (reference cnmf.py:776-802).

    ``X`` may be a host array or an already-device-resident jax array —
    consensus reuses one device copy across its three refits to avoid
    re-uploading the full-gene TPM matrix. A device-resident X may be
    cell-padded for even mesh sharding (parallel.mesh.put_cells): pass
    ``n_rows`` = the real row count, and the padding stays exactly neutral —
    padded W rows are pinned at 0 (CD inits at 0; MU gets a masked init and
    a real-element mean) and the result is sliced back to ``n_rows``.
    When X's COLUMNS are padded cells (the transpose-trick spectra refit),
    the fixed spectra grow matching zero columns, which contribute nothing
    to the HHt gram or the XHt product."""
    import scipy.sparse as sp

    solver = nmf_kwargs.get("solver", "cd")
    k = spectra.shape[0]
    # zero-pad the component count to a bucket of 8 so refits across a K
    # sweep share one compiled program (exact no-op for both solvers; the MU
    # avg-init on padded components is irrelevant — their spectra rows are 0
    # so their usage converges to 0 and is sliced away)
    pad_k = -(-k // 8) * 8
    spectra_p = np.ascontiguousarray(spectra.T, dtype=dtype)
    real_cols = spectra_p.shape[0]
    if pad_k > k:
        spectra_p = np.pad(spectra_p, ((0, 0), (0, pad_k - k)))

    if sp.issparse(X):
        if solver == "cd":
            # host-sparse X never densifies anywhere: the CD refit consumes
            # only the spectra gram and P = X·Htᵀ — one host SpMM (O(nnz·k))
            # — and the device runs the tiny (N, pad_k) half-sweep loop.
            if beta_loss_to_float(
                nmf_kwargs.get("beta_loss", "frobenius")
            ) != 2.0:
                raise ValueError("CD solver supports frobenius loss only")
            n_real = X.shape[0] if n_rows is None else int(n_rows)
            l1_reg_W, _, l2_reg_W, _ = compute_regularization(
                float(nmf_kwargs.get("alpha_W", 0.0)),
                nmf_kwargs.get("alpha_H", "same"),
                float(nmf_kwargs.get("l1_ratio", 0.0)),
                X.shape,
            )
            sp_d = jnp.asarray(spectra_p[None])
            gram = fixed_factor_gram(sp_d)
            P = jnp.asarray(
                np.ascontiguousarray((X @ spectra_p), dtype=dtype)
            )[None]
            W0 = jnp.zeros((1, X.shape[0], pad_k), dtype)
            # over-limit atlas path on a mesh: the (cells × pad_k) solve
            # state row-shards over the device grid
            gram, P, W0, _ = shard_products_rows(gram, P, W0)
            W, _ = nnls_cd_from_products(
                gram, P, W0,
                tol=float(nmf_kwargs.get("tol", 1e-4)),
                max_iter=int(nmf_kwargs.get("max_iter", 200)),
                l1_reg=l1_reg_W, l2_reg=l2_reg_W,
            )
            return np.asarray(W[0, :n_real, :k])
        # MU needs the reconstruction against X itself — densify on host
        from cnmf_tpu.native import densify_csr

        X = densify_csr(X, out_dtype=dtype)

    if isinstance(X, jax.Array):
        Xd = X.astype(dtype) if X.dtype != dtype else X
        n_total = Xd.shape[0]
        n_real = n_total if n_rows is None else int(n_rows)
        if spectra_p.shape[0] < Xd.shape[1]:
            spectra_p = np.pad(
                spectra_p, ((0, Xd.shape[1] - spectra_p.shape[0]), (0, 0))
            )
        if solver == "mu":
            # mean over the REAL elements (zero-padded rows/columns excluded)
            avg = float(jnp.sqrt(jnp.sum(Xd) / (n_real * real_cols) / k))
            W0 = jnp.full((1, n_total, pad_k), avg, dtype=dtype)
            if n_real < n_total:
                rowmask = jnp.arange(n_total) < n_real
                W0 = W0 * rowmask[None, :, None].astype(dtype)
        else:
            W0 = jnp.zeros((1, n_total, pad_k), dtype=dtype)
    else:
        n_real = X.shape[0] if n_rows is None else int(n_rows)
        Xd = jnp.asarray(np.ascontiguousarray(X, dtype=dtype))
        W0 = jnp.asarray(
            np.pad(nnls_w_init(X, k, solver, dtype=dtype),
                   ((0, 0), (0, pad_k - k)),
                   mode="edge" if solver == "mu" else "constant")[None]
        )
    Ht0 = jnp.asarray(spectra_p[None])
    W0, Ht0 = _match_factor_shardings(Xd, W0, Ht0)
    W, _, _ = solve_nmf_batch(
        Xd, W0, Ht0, nmf_kwargs, update_H=False, mu_chunk=mu_chunk
    )
    return np.asarray(W[0, :n_real, :k])
