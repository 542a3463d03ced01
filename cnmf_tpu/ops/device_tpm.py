"""Compact TPM upload: ship integer counts, scale rows on device.

The consensus stage wants the full-gene TPM dense in HBM (~100 MB at PBMC
scale, GBs at atlas scale). The factorize-time prefetch otherwise uploads
that float buffer through a host→device link measured at ~32 MB/s — and the
upload's host work (h5ad read-back, dtype cast, transfer serialization)
contends with the factorize dispatch loop on this single-vCPU host (measured
as the bench's 4.5 s `dispatch_s`: enqueue RPCs queueing behind the bulk TPM
bytes on the relay's ordered channel).

TPM is just `counts * (target_sum / row_sum)`, and raw scRNA counts are
small non-negative integers: when they fit uint8/int16, shipping the integer
matrix plus a per-cell scale vector moves 2-4x fewer bytes and does near-zero
host work — the float expansion is ONE fused device program
(cast + broadcast-multiply). Replaces the reference's host-side
`sc.pp.normalize_total` product reaching the compute device (reference
cnmf.py:245-251); exactness: integers are exact in f32, so the device value
is `f32(count) * f32(scale)` vs the host's `f32(f64 count * f64 scale)` —
equal to ≤2 ulp (~2e-7 relative), far inside the pipeline's 1e-4 artifact
tolerance. `CNMF_TPU_DEVICE_TPM=0` restores the bit-identical float upload.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

# keep the host-side stash bounded: the integer copy lives on the cNMF
# object between prepare and factorize (same-process pipelines only)
_MAX_STASH_BYTES = int(2.5e8)


def compact_integer_counts(X) -> np.ndarray | None:
    """Smallest-integer-dtype copy of a dense counts matrix, or None.

    Returns a uint8 (max ≤ 255) or int16 (max ≤ 32767) array whose values
    equal ``X`` exactly; None when X is not a dense ndarray of non-negative
    integral values in range, or when the compact copy would exceed the
    stash budget. int32 and wider are never returned — they save no bytes
    over the float32 the link would otherwise carry.
    """
    if not isinstance(X, np.ndarray) or X.ndim != 2:
        return None
    if X.dtype.kind not in "fiu":
        return None
    # cheap range probe first (one pass) so the cast+verify pass only runs
    # on plausible inputs
    mx = X.max() if X.size else 0
    mn = X.min() if X.size else 0
    if not (np.isfinite(mx) and np.isfinite(mn)) or mn < 0:
        return None
    if mx <= 255:
        dtype = np.uint8
    elif mx <= 32767:
        dtype = np.int16
    else:
        return None
    if X.size * np.dtype(dtype).itemsize > _MAX_STASH_BYTES:
        return None
    # input already at the minimal dtype: alias a READ-ONLY view — the
    # stash's <=2-ulp device-TPM/norm contract depends on the values never
    # changing after prepare, and an astype would first-touch a fresh
    # 27-54 MB copy inside prepare's wall for identical values. The frozen
    # view keeps the zero-copy win while making accidental caller mutation
    # fail loudly instead of silently corrupting the stash.
    if X.dtype == np.dtype(dtype):
        ints = X.view()
        ints.setflags(write=False)
    else:
        ints = X.astype(dtype)
    if X.dtype.kind == "f" and not np.array_equal(ints, X):
        return None  # non-integral values
    return ints


def tpm_row_scale(X, target_sum: float = 1e6) -> np.ndarray:
    """Per-cell TPM scale ``target_sum / row_sum`` (float64), zero-sum rows
    mapped through a safe denominator exactly like
    ``ops.normalize.normalize_total``'s dense branch (whose product this
    scale reproduces on device)."""
    totals = np.asarray(X).sum(axis=1, dtype=np.float64)
    safe = np.where(totals == 0, 1.0, totals)
    return target_sum / safe


@jax.jit
def tpm_from_counts(ints, scale):
    """Dense TPM at ``scale.dtype`` from integer counts: one fused
    cast + broadcast-multiply program."""
    return ints.astype(scale.dtype) * scale[:, None]


def device_tpm_from_counts(ints: np.ndarray, scale: np.ndarray):
    """Upload the compact integer counts + per-cell scale and expand to the
    dense float TPM on device. ``scale``'s dtype is the output dtype."""
    return tpm_from_counts(jnp.asarray(ints), jnp.asarray(scale))


def norm_column_spec(counts_var_index, hvg_index, ints, dtype, std=None):
    """(cols int32, std) mapping the HVG subset into the integer counts for
    ``norm_from_counts``, or None when the gene names don't map uniquely or
    the per-gene std is degenerate.

    ``std`` replicates the dense branch of ``ops.normalize
    .scale_unit_variance`` (ddof=1, NO zero guard — reference cnmf.py:542
    divides unguarded) over the float64 cast of the SUBSET counts — the
    exact divisor prepare's norm_counts used, since the integer image equals
    the counts bit-for-bit. Callers that already hold that divisor (prepare
    computed it to scale norm_counts) pass it in and skip the subset + std
    recompute pass here."""
    if not counts_var_index.is_unique:
        return None
    cols = counts_var_index.get_indexer(hvg_index)
    if (cols < 0).any():
        return None
    cols = cols.astype(np.int32)
    if std is None:
        std = ints[:, cols].astype(np.float64).std(axis=0, ddof=1)
    else:
        # alignment spot-check: the passed-in divisor must match the HVG
        # column ORDER, not just the shape — recompute a few sampled columns
        # from the integer image (bit-equal to the counts) and compare. A
        # reordered h5ad var index upstream would otherwise silently
        # mis-scale genes within the 1e-4 contract's blast radius.
        std_arr = np.asarray(std, dtype=np.float64)
        if std_arr.shape == cols.shape and len(cols):
            probe = np.unique(
                np.linspace(0, len(cols) - 1, num=min(3, len(cols)), dtype=int)
            )
            ref = ints[:, cols[probe]].astype(np.float64).std(axis=0, ddof=1)
            if not np.allclose(ref, std_arr[probe], rtol=1e-9, atol=0.0):
                return None  # misaligned divisor: keep the exact float path
    std = np.asarray(std, dtype=np.float64)
    if std.shape != cols.shape or not np.isfinite(std).all() or (std == 0).any():
        return None  # degenerate genes: keep the exact float path
    return cols, std.astype(dtype)


# --- CSR-compact integer upload ---------------------------------------------
# The integer image is itself mostly zeros on real scRNA data (raw counts are
# 80-95% zero), so the link bytes shrink again by shipping CSR components
# (uint8/int16 data + int16 cols when the gene axis fits) and scattering into
# the dense integer image ON DEVICE — the same trick ops/device_densify plays
# for float uploads of sparse inputs, applied to the compact counts image.
# Bit-identical to the dense upload: one canonical entry per coordinate,
# scatter-ADD into zeros. Gate: CNMF_TPU_CSR_UPLOAD ('1' default, TPU backend
# only — on CPU there is no link to save; 'force' for tests; '0' off).

# pad nnz to this bucket so similarly-filled images reuse one compiled
# scatter program; small enough that the pad overhead stays under ~1.6 MB
_CSR_NNZ_BUCKET = 1 << 19


def int_image_csr(ints: np.ndarray):
    """CSR components ``(data, cols, indptr)`` of a dense integer image with
    the narrowest column dtype, or None when shipping them (including the nnz
    pad bucket) would not beat the dense bytes. Built once at prepare-stash
    time — factorize's upload moment stays host-light."""
    n, g = ints.shape
    # gate on count_nonzero FIRST (~20 ms at 27M elements) so a declined
    # image — e.g. anything over ~17% fill — never pays the flatnonzero +
    # gather passes (~0.5-0.9 s at that size) inside prepare's wall
    nnz = int(np.count_nonzero(ints))
    col_dtype = np.int16 if g <= np.iinfo(np.int16).max else np.int32
    padded = nnz + ((-nnz) % _CSR_NNZ_BUCKET)
    csr_bytes = (
        padded * (ints.dtype.itemsize + np.dtype(col_dtype).itemsize)
        + (n + 1) * 4
    )
    # measured break-even on the relay link (2700×10000 uint8): at a 0.65
    # byte ratio the densify program eats the saving (0.451 s vs 0.428 s
    # dense); at 0.18 it wins 2.5x (0.128 s vs 0.317 s). Gate at half.
    if csr_bytes >= 0.5 * ints.nbytes:
        return None
    flat = np.flatnonzero(ints.ravel())
    data = ints.ravel()[flat]
    cols = (flat % g).astype(col_dtype)
    indptr = np.zeros(n + 1, dtype=np.int32)
    # row-major flatnonzero → canonical CSR; stash budget keeps nnz < 2^31
    indptr[1:] = np.cumsum(np.bincount(flat // g, minlength=n))
    return data, cols, indptr


@functools.partial(jax.jit, static_argnames=("n_rows", "n_cols"))
def _densify_int_csr(data, cols, indptr, n_rows: int, n_cols: int):
    # row ids by scatter-marks + cumsum, NOT searchsorted: XLA's searchsorted
    # binary-searches per element (measured 1.1 s for 6.3M lookups on this
    # chip; the whole cumsum-form program incl. the scatter runs ~0.05 s). Each indptr[1:] value marks where
    # the next row starts; empty rows stack multiple marks on one position
    # (scatter-ADD), and the running sum recovers the row of every entry.
    # Padded tail positions (>= indptr[-1]) accumulate row ids past n_rows
    # and are dropped — their data is 0 regardless, so even a kept add would
    # be a no-op.
    nnz = data.shape[0]
    marks = jnp.zeros((nnz,), jnp.int32).at[indptr[1:]].add(1, mode="drop")
    rows = jnp.cumsum(marks)
    dense = jnp.zeros((n_rows, n_cols), dtype=data.dtype)
    return dense.at[rows, cols.astype(jnp.int32)].add(
        data, mode="drop", indices_are_sorted=True
    )


def csr_upload_enabled() -> bool:
    env = os.environ.get("CNMF_TPU_CSR_UPLOAD", "1")
    if env == "force":
        return True
    return env == "1" and jax.default_backend() == "tpu"


# sentinel: "no pre-built components — compute them here if enabled";
# an explicit None means a prior int_image_csr already said not-a-byte-win
_COMPUTE_CSR = object()


def upload_int_image(ints: np.ndarray, csr=_COMPUTE_CSR):
    """Device dense copy of ``ints`` — via CSR components when that moves
    fewer bytes over the link, else the plain dense transfer. Returns
    ``(device_array, link_bytes)``; the device value is bit-identical to
    ``jnp.asarray(ints)`` either way."""
    if csr is _COMPUTE_CSR:
        csr = int_image_csr(ints) if csr_upload_enabled() else None
    if csr is not None and csr_upload_enabled():
        data, cols, indptr = csr
        pad = (-data.shape[0]) % _CSR_NNZ_BUCKET
        if pad:
            data = np.concatenate([data, np.zeros(pad, dtype=data.dtype)])
            cols = np.concatenate([cols, np.zeros(pad, dtype=cols.dtype)])
        dense = _densify_int_csr(
            jnp.asarray(data), jnp.asarray(cols), jnp.asarray(indptr),
            int(ints.shape[0]), int(ints.shape[1]),
        )
        return dense, data.nbytes + cols.nbytes + indptr.nbytes
    return jnp.asarray(ints), ints.nbytes


@jax.jit
def norm_from_counts(ints, cols, std):
    """Factorize input (unit-variance-scaled HVG counts) from the integer
    counts on device: gather the HVG columns, cast to ``std.dtype``, divide
    by the per-gene std. vs the host float64 pipeline both sides round the
    true quotient to f32 — equal to <=2 ulp."""
    return ints[:, cols].astype(std.dtype) / std[None, :]


@jax.jit
def derive_norm_and_tpm(ints, cols, std, scale):
    """Factorize input AND the consensus-stage full-gene TPM from the SAME
    device integer image in ONE program. ``norm_from_counts`` and
    ``tpm_from_counts`` each expanded this image as their own XLA program
    (~1.9 s of serial remote compile cold + an extra dispatch warm); both
    expansions are elementwise over the one input, so fusing them is free.
    Outputs are bit-identical to the two separate programs (identical op
    sequences per element)."""
    return (
        ints[:, cols].astype(std.dtype) / std[None, :],
        ints.astype(scale.dtype) * scale[:, None],
    )
