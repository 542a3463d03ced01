"""The cNMF pipeline orchestrator — TPU-native, reference-compatible.

Same five-stage API and on-disk artifact contract as the reference
(prepare / factorize / combine / consensus / k_selection_plot, reference
cnmf.py:265-1210), but the compute re-designed for TPU:

* ``factorize`` runs the whole restart grid for each K as ONE batched device
  program (vmap-style leading restart axis, optionally sharded over a device
  mesh) instead of worker-indexed CPU jobs — see cnmf_tpu.ops.nmf.
* ``consensus`` runs its hot pieces on device: L2 normalization, the R×R
  distance matrix + KNN density filter, batched-restart KMeans, NNLS refits
  and the z-score OLS regression.
* Stage boundaries still materialize the reference's files (SURVEY §2.9), so
  resume/elasticity semantics and downstream consumers are unchanged.
"""

from __future__ import annotations

import datetime
import os
import shutil
import uuid
import warnings
import weakref
from typing import Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp
import yaml

import jax
import jax.numpy as jnp

from cnmf_tpu.io.anndata_lite import AnnData
from cnmf_tpu.io.dataframe import (
    check_dir_exists,
    load_df_from_npz,
    save_df_to_npz,
    save_df_to_text,
)
from cnmf_tpu.io.h5ad import read_h5ad, write_h5ad
from cnmf_tpu.io.loaders import load_counts
from cnmf_tpu.native import densify_csr
from cnmf_tpu.ops.distance import local_density_from_spectra, pairwise_euclidean
from cnmf_tpu.ops.init import (
    nndsvd_init,
    random_init_batch,
    random_init_batch_device,
)
from cnmf_tpu.ops.kmeans import kmeans_fit
from cnmf_tpu.ops.nmf import pack_spectra_true_k
from cnmf_tpu.ops.normalize import normalize_total, scale_unit_variance
from cnmf_tpu.ops.ols import efficient_ols_all_cols
from cnmf_tpu.ops.stats import get_highvar_genes, mean_var
from cnmf_tpu.parallel.mesh import build_mesh, put_cells
from cnmf_tpu.pipeline.paths import build_paths
from cnmf_tpu.pipeline.plots import clustergram, k_selection_figure
from cnmf_tpu.utils.timing import stage_timer, timed
from cnmf_tpu.ops.kstats import consensus_k_stats, consensus_k_stats_device
from cnmf_tpu.pipeline.solvers import (
    beta_loss_to_float,
    cd_pallas_eligible,
    compute_regularization,
    device_init_enabled,
    device_kmeanspp_enabled,
    device_ladder_enabled,
    device_spectra_enabled,
    mu_pallas_eligible,
    refit_spectra_transposed,
    refit_usages,
    solve_nmf_batch,
    solve_nmf_batch_ladder,
    solve_nmf_batch_ladder_seeded,
    solve_nmf_sharded_device,
    solve_nmf_batch_sharded,
    solve_nmf_batch_sharded_seeded,
    solve_nmf_grid,
    solve_nmf_staged,
)


import threading

# guards every instance's artifact memo (class-wide: negligible contention,
# and instances stay picklable for the multiprocessing shim)
_MEMO_LOCK = threading.Lock()

# (B, G, K) solver output → (B, K, G) fetch layout; a device transpose makes
# the host-side spectra buffer row-contiguous per spectrum (see factorize).
# Shared with the grid/staged schedulers — one jitted program, not two
# duplicate cache entries (each cached-executable load costs seconds on axon).
from cnmf_tpu.ops.nmf import _swap_bg_axes as _swap_components_genes

# guards the h5ad read cache: the TPM prefetch thread (factorize) and the
# main thread (consensus) may populate it concurrently
_H5AD_LOCK = threading.Lock()

# the consensus/k_selection default density threshold (reference cnmf.py:823,
# 1127-1130) — shared so the sweep's stats rows can't drift from the
# consensus signature
DEFAULT_DENSITY_THRESHOLD = 0.5

# row schema of the consensus stats / k_selection table (reference
# cnmf.py:932-934)
K_STATS_FIELDS = ["k", "local_density_threshold", "silhouette", "prediction_error"]


def _drain_hold_seconds():
    """Max seconds a deferred packed drain may hold its d→h fetch waiting
    for a release signal (CNMF_TPU_DRAIN_HOLD_S). The drain's bytes are not
    on the headline's critical path, but its slot on the relay's single
    ordered channel is: bench run E measured the fused consensus program
    queueing behind the 64.8 MB packed transfer. Holding the fetch until the
    downstream stage has dispatched AND fetched its own device work (or a
    reader/flush needs the bytes — both release immediately) sequences the
    bulk transfer last. 0 disables the hold (CPU default: no relay, nothing
    to schedule around); the timeout bounds worst-case write latency for a
    caller that never flushes."""
    raw = os.environ.get("CNMF_TPU_DRAIN_HOLD_S")
    if raw is not None:
        try:
            return max(0.0, float(raw))
        except ValueError:
            return 0.0
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return 0.0
    return 10.0 if backend != "cpu" else 0.0


class _PendingBatch:
    """Placeholder for a K's (B, k, G) spectra batch whose device→host drain
    is still in flight on the background writer (deferred packed drain,
    CNMF_TPU_ASYNC_WRITES=1): factorize returns as soon as the solves are
    dispatched and the transfer is queued; the writer thread lands the bytes,
    sets ``value`` and then ``event``. A failed drain leaves ``value`` None —
    readers fall back to the per-iteration FILES, whose reads join the writer
    future and re-raise the real error."""

    __slots__ = ("event", "value", "shape", "nbytes")

    def __init__(self, shape, nbytes):
        self.event = threading.Event()
        self.value = None
        self.shape = shape
        self.nbytes = nbytes

    def wait(self):
        self.event.wait()
        return self.value


def worker_filter(iterable, worker_index, total_workers):
    """Round-robin shard: element i goes to worker i % total_workers
    (reference cnmf.py:52-53); kept for CLI/API compatibility."""
    return (p for i, p in enumerate(iterable) if (i - worker_index) % total_workers == 0)


class cNMF:
    """Consensus NMF over a restarts × K grid, batched on TPU.

    Parameters
    ----------
    output_dir : str — analysis output root (default ".").
    name : str — run name, prefixed to every file; auto-generated
        ``YYYY_MM_DD_<6-hex>`` when None (reference cnmf.py:268-288).
    compute_dtype : numpy dtype for device math (default float32; use float64
        on CPU when exact sklearn parity is wanted).
    """

    def __init__(self, output_dir=".", name=None, compute_dtype=np.float32):
        self.output_dir = output_dir
        if name is None:
            now = datetime.datetime.now()
            rand_hash = uuid.uuid4().hex[:6]
            name = "%s_%s" % (now.strftime("%Y_%m_%d"), rand_hash)
        self.name = name
        self.paths = None
        self.compute_dtype = np.dtype(compute_dtype)
        self._initialize_dirs()

    def _initialize_dirs(self):
        if self.paths is None:
            check_dir_exists(self.output_dir)
            check_dir_exists(os.path.join(self.output_dir, self.name))
            check_dir_exists(os.path.join(self.output_dir, self.name, "cnmf_tmp"))
            self.paths = build_paths(self.output_dir, self.name)

    def _device_cached(self, attr: str, key_obj, build):
        """Single-entry device-buffer cache keyed by a weakref to the host
        object (a weakref can never alias a recycled id()). Release with
        clear_device_caches()."""
        import weakref

        cached = getattr(self, attr, None)
        if cached is not None and cached[0]() is key_obj:
            return cached[1]
        value = build()
        setattr(self, attr, (weakref.ref(key_obj), value))
        return value

    def _put_cells(self, arr):
        """Upload a (cells × features) matrix with the cell axis sharded over
        every local device (zero-padded to an even shard, see
        parallel.mesh.put_cells) — the consensus-stage NNLS refits, z-score
        OLS and fused k-stats then run GSPMD-partitioned, with the gram /
        moment reductions over cells psum'd across the mesh (SURVEY §2.6).
        Set ``self.shard_cells = False`` to force replicated uploads."""
        if getattr(self, "shard_cells", True):
            return put_cells(arr)
        return jnp.asarray(arr)

    def _to_device_dense(self, Xm):
        """Dense device buffer of a host counts/TPM matrix. Sparse inputs
        ride the link as CSR components and densify on device when that's a
        byte win (ops/device_densify — ~10× fewer transferred bytes at
        atlas fill rates); everything else takes the host densify +
        (sharded) upload path."""
        from cnmf_tpu.ops.device_densify import (
            device_densify_csr,
            device_densify_eligible,
        )

        n_dev = len(jax.devices()) if getattr(self, "shard_cells", True) else 1
        if device_densify_eligible(Xm, self.compute_dtype, n_devices=n_dev):
            return device_densify_csr(Xm, out_dtype=self.compute_dtype)
        return self._put_cells(densify_csr(Xm, out_dtype=self.compute_dtype))

    def clear_device_caches(self, host_caches: bool = False):
        """Drop cached device buffers (norm counts / TPM / integer counts) —
        frees HBM between pipeline stages. ``host_caches=True`` also drops
        the h5ad read cache; by default it is KEPT: it lives in host memory,
        every hit is mtime-validated (out-of-band rewrites always win), and
        dropping it would both force factorize to re-read files this process
        just wrote and break the object-identity keys of the compact-counts
        stashes (ops/device_tpm)."""
        self._join_tpm_prefetch()  # an in-flight upload would repopulate
        attrs = ["_norm_counts_dev_cache", "_tpm_dev_cache", "_ints_dev",
                 "_merged_dev"]
        if host_caches:
            attrs.append("_h5ad_cache")
        for attr in attrs:
            if hasattr(self, attr):
                delattr(self, attr)
        # the spectra-stack memo's device twins pin the packed factorize
        # buffer in HBM; drop the handles, keep the host batches (the memo
        # stays a valid combine fast path)
        with _MEMO_LOCK:
            memo = getattr(self, "_stack_memo", None)
            if memo:
                for k_, entry in list(memo.items()):
                    if entry[3] is not None:
                        memo[k_] = entry[:3] + (None,)
        # a deferred merge's registered meta carries the same twin — strip
        # it too (consensus then falls back to the host values via the
        # joined merge), or the HBM handle would outlive the clear
        with _H5AD_LOCK:
            metas = getattr(self, "_merged_meta", None)
            if metas:
                for path_, meta in list(metas.items()):
                    if meta[4] is not None:
                        metas[path_] = meta[:4] + (None,)

    # in-process artifact memo: stages still WRITE every §2.9 file (the
    # on-disk contract is the reference's restart/elasticity story), but a
    # same-process downstream stage can skip re-READING what this object just
    # wrote. Entries are validated by nanosecond mtime + size so out-of-band
    # edits or other workers' files always win; recall returns a copy so a
    # caller mutating a returned frame can never corrupt later stages.
    _ARTIFACT_MEMO_BYTES = int(5e8)

    # memo stat sentinel: the object is authoritative while its file write
    # is still in flight on the background writer (async combine) — recall
    # must not stat-validate against a file that does not exist yet
    _PENDING_STAT = (-1, -1)

    def _memo_artifact(self, path, obj, nbytes, stat=None):
        """``stat``: the (mtime_ns, size) pair returned by save_df_to_npz for
        the write being memoized. Passing it closes the race where another
        process rewrites ``path`` between our write and an os.stat here —
        the memo must never pair another writer's identity with our object.
        Returns True when the entry was stored (callers queuing an async
        write need to know — a declined memo means readers will fall back
        to the FILE and must join the pending write first)."""
        if stat is not None:
            mtime_ns, size = stat
        else:
            try:
                st = os.stat(path)
                mtime_ns, size = st.st_mtime_ns, st.st_size
            except OSError:
                return False
        with _MEMO_LOCK:
            memo = getattr(self, "_artifact_memo", None)
            if memo is None:
                memo = self._artifact_memo = {}
                self._artifact_memo_bytes = 0
            prev = memo.get(path)
            used = self._artifact_memo_bytes - (prev[3] if prev else 0)
            if used + nbytes > self._ARTIFACT_MEMO_BYTES:
                return False
            memo[path] = (mtime_ns, size, obj, nbytes)
            self._artifact_memo_bytes = used + nbytes
            return True

    # per-K spectra-stack memo: factorize already holds all restarts for a K
    # as ONE (B, k, G) array before splitting it into per-iteration files; a
    # same-process combine can rebuild the merged frame from it with a single
    # reshape instead of 900 frame recalls + a concat. Validated per FILE
    # (path + the exact stat captured at write time), so partial re-runs or
    # out-of-band rewrites fall back to reading the files.
    _STACK_MEMO_BYTES = int(5e8)

    def _memo_spectra_stack(self, k, file_stats, spectra_batch, gene_index,
                            dev=None):
        """file_stats: [(iter, path, (mtime_ns, size))] in batch-row order.
        Returns True iff stored (the byte cap can decline — async callers
        must then keep their writes durable-before-return).
        ``dev``: optional (packed_device_array, row_offset, n_rows) locating
        this K's true-K spectra inside the device buffer factorize packed —
        a same-process consensus can consume it without re-uploading the
        merged copy (CNMF_TPU_DEVICE_SPECTRA)."""
        nbytes = spectra_batch.nbytes
        with _MEMO_LOCK:
            memo = getattr(self, "_stack_memo", None)
            if memo is None:
                memo = self._stack_memo = {}
                self._stack_memo_bytes = 0
            prev = memo.get(k)
            used = self._stack_memo_bytes - (prev[2].nbytes if prev else 0)
            if used + nbytes > self._STACK_MEMO_BYTES:
                return False
            by_iter = {
                it: (path, stat, row) for row, (it, path, stat) in enumerate(file_stats)
            }
            memo[k] = (by_iter, gene_index, spectra_batch, dev)
            self._stack_memo_bytes = used + nbytes
            return True

    def _recall_spectra_stack(self, k, files, join=True):
        """Return (values, columns, dev) for the merged stack — at the
        batch's own dtype — iff the memo covers EXACTLY the requested
        (iter, path) list and every file on disk still carries the stat
        captured at write time; else None. ``dev`` is the device twin
        descriptor (or None) — only returned for a complete IN-ORDER run,
        where the device rows and the merged rows coincide.

        ``join=False``: when the batch is still a _PendingBatch (deferred
        packed drain) return it UNJOINED in the values slot instead of
        blocking — only for an in-order run (callers consume the batch
        whole); out-of-order recalls join regardless."""
        with _MEMO_LOCK:
            memo = getattr(self, "_stack_memo", None)
            entry = memo.get(k) if memo else None
        if entry is None:
            return None
        by_iter, gene_index, batch, dev = entry
        if len(files) != len(by_iter):
            return None
        rows = []
        for it, path in files:
            hit = by_iter.get(it)
            if hit is None or hit[0] != path:
                return None
            if hit[1] == self._PENDING_STAT:
                # our own write is still queued on the background writer
                # (CNMF_TPU_ASYNC_WRITES): the memoized batch IS the file's
                # future content — no stat to validate yet
                rows.append(hit[2])
                continue
            try:
                st = os.stat(path)
            except OSError:
                return None
            if (st.st_mtime_ns, st.st_size) != hit[1]:
                return None
            rows.append(hit[2])
        if isinstance(batch, _PendingBatch):
            in_order = rows == list(range(batch.shape[0]))
            if not join and in_order:
                return batch, gene_index, dev
            self._release_drains()  # the caller needs the bytes NOW
            batch = batch.wait()
            if batch is None:
                # the drain failed: fall back to the files, whose reads join
                # the writer future and re-raise the real error
                return None
        if rows == list(range(batch.shape[0])):
            # complete in-order run (the common case): reshape is a VIEW of
            # the already-warm batch — the merged write streams straight from
            # it with zero fresh pages faulted. The view is marked read-only:
            # the frame escapes to combine_nmf's caller, and a caller
            # writing through .values must raise rather than silently
            # corrupt the memoized batch.
            values = batch.reshape(-1, batch.shape[2])
            values.flags.writeable = False
        else:
            # the fancy index is a fresh contiguous copy at batch dtype;
            # upcasting it to f64 would change no value, only fault twice
            # the pages. Row order differs from the device twin's, so the
            # twin does not apply.
            values = batch[rows].reshape(-1, batch.shape[2])
            dev = None
        return values, gene_index, dev

    def _device_spectra_twin(self, k, merged_frame):
        """The (R, G) device-resident RAW merged spectra for ``k`` — the
        packed true-K buffer a same-process factorize left on device — iff
        CNMF_TPU_DEVICE_SPECTRA applies and the registered twin describes
        EXACTLY the merged frame just recalled (weakref identity: the twin
        dies with the memo entry it was built against). The fused consensus
        L2-normalizes and pads it in-program, so no spectra bytes cross the
        link. Returns a device array or None (host path)."""
        if merged_frame is None or not device_spectra_enabled():
            return None
        with _MEMO_LOCK:
            twins = getattr(self, "_merged_dev", None)
            entry = (
                twins.get(self.paths["merged_spectra"] % k) if twins else None
            )
        if entry is None:
            return None
        wr, (packed, off, rows) = entry
        if wr() is not merged_frame:
            return None
        try:
            return packed[off:off + rows]
        except Exception:
            # the device buffer may have been donated/deleted by a cache
            # clear — the host path is always correct
            return None

    def _defer_merged_write(self, k, pb, columns, files, dev_twin):
        """Queue the merged-spectra build+write for ``k`` on the background
        writer while factorize's packed drain is still in flight
        (CNMF_TPU_ASYNC_WRITES=1). Registers `_merged_meta` — the (index,
        columns, placeholder, device-twin) a same-process consensus can run
        from without touching host values — keyed to the queued future so a
        stale registration never outlives its write. Returns None (only
        combine()'s fan-out calls this; it discards per-K returns)."""
        merged_path = self.paths["merged_spectra"] % k
        index = [
            "iter%d_topic%d" % (it, t + 1) for (it, _) in files
            for t in range(k)
        ]

        def merge_and_write(pb=pb, index=index, columns=columns,
                            merged_path=merged_path, dev_twin=dev_twin):
            batch = pb.wait()
            if batch is None:
                raise RuntimeError(
                    "deferred spectra drain failed — merged stack for k=%d "
                    "not built" % k
                )
            values = batch.reshape(-1, batch.shape[2])
            try:
                values.flags.writeable = False
            except ValueError:
                pass
            frame = pd.DataFrame(values, index=index, columns=columns,
                                 copy=False)
            st = save_df_to_npz(frame, merged_path)
            stored = self._memo_artifact(
                merged_path, frame, values.nbytes, stat=st
            )
            if stored and dev_twin is not None:
                import weakref

                with _MEMO_LOCK:
                    twins = getattr(self, "_merged_dev", None)
                    if twins is None:
                        twins = self._merged_dev = {}
                    twins[merged_path] = (weakref.ref(frame), dev_twin)

        with _H5AD_LOCK:
            # drop a previous run's registration BEFORE queueing: a reader
            # between the (old) pop and the (new) submit must see no meta
            # rather than a stale one
            metas = getattr(self, "_merged_meta", None)
            if metas is not None:
                metas.pop(merged_path, None)
        self._submit_pending_write(merged_path, merge_and_write)
        with _H5AD_LOCK:
            fut = self._pending_writes.get(merged_path)
            metas = getattr(self, "_merged_meta", None)
            if metas is None:
                metas = self._merged_meta = {}
            metas[merged_path] = (fut, pd.Index(index), columns, pb, dev_twin)
        return None

    def _deferred_merged_meta(self, merged_path):
        """The (index, columns, placeholder, device-twin) registered for a
        merged stack whose build is still queued on the writer — valid only
        while the registered future IS the path's current pending write
        (once flushed or superseded, readers must go through the memo/file,
        which carry the authoritative content)."""
        with _H5AD_LOCK:
            metas = getattr(self, "_merged_meta", None)
            meta = metas.get(merged_path) if metas else None
            if meta is None:
                return None
            cur = (getattr(self, "_pending_writes", None) or {}).get(
                merged_path
            )
        fut, index, columns, pb, dev_twin = meta
        if cur is not fut:
            return None
        return index, columns, pb, dev_twin

    def _settle_stack_stat(self, k, it, path, stat):
        """Replace a PENDING per-iteration stat in the K-stack memo with the
        real write-time stat (runs on the writer thread once the file is
        durable). Guarded: a later factorize may have replaced the K entry —
        only settle the exact (iter, path) pair still marked PENDING."""
        with _MEMO_LOCK:
            memo = getattr(self, "_stack_memo", None)
            entry = memo.get(k) if memo else None
            if entry is None:
                return
            hit = entry[0].get(it)
            if hit is not None and hit[0] == path and hit[1] == self._PENDING_STAT:
                entry[0][it] = (path, stat, hit[2])

    def _recall_artifact(self, path, copy=True):
        """``copy=False`` skips the defensive copy — only for internal
        consumers that treat the recalled object as read-only (900 spectra
        copies cost real wall time in combine)."""
        with _MEMO_LOCK:
            memo = getattr(self, "_artifact_memo", None)
            if not memo or path not in memo:
                return None
            mtime_ns, size, obj, nbytes = memo[path]
            if (mtime_ns, size) == self._PENDING_STAT:
                # write in flight on the background writer: the memo object
                # IS the file's future content — no stat to validate yet
                return obj.copy() if copy else obj
            try:
                st = os.stat(path)
                stale = st.st_mtime_ns != mtime_ns or st.st_size != size
            except OSError:
                stale = True
            if stale:
                del memo[path]
                self._artifact_memo_bytes -= nbytes
                return None
        return obj.copy() if copy else obj

    # HBM per chip by device-kind substring; used to size the "keep the
    # full-gene TPM resident on device" threshold when the runtime doesn't
    # expose memory stats (the axon relay returns None)
    _HBM_BY_KIND = (
        ("v5 lite", 16e9), ("v5e", 16e9), ("v5p", 95e9),
        ("v6 lite", 32e9), ("v6e", 32e9), ("v4", 32e9), ("v3", 16e9),
    )

    def _tpm_device_limit(self):
        """Byte threshold under which the full-gene TPM matrix stays
        device-resident for the consensus refits/OLS. Above it, sparse
        inputs take the host-SpMM product path (the TPM never goes dense
        anywhere) and dense inputs the chunked host fallback. Override with
        ``self.tpm_device_bytes_limit``.

        0.25×HBM: the resident TPM coexists with the norm-counts buffer,
        the scatter-densify transfer temps and the fused program's
        workspace — an 8 GB TPM on a 16 GB v5e measured RESOURCE_EXHAUSTED
        even though it nominally "fits"."""
        override = getattr(self, "tpm_device_bytes_limit", None)
        if override is not None:
            return override
        try:
            dev = jax.devices()[0]
            if dev.platform == "tpu":
                stats = dev.memory_stats() or {}
                limit = stats.get("bytes_limit")
                if limit:
                    return 0.25 * limit
                kind = dev.device_kind.lower()
                for key, hbm in self._HBM_BY_KIND:
                    if key in kind:
                        return 0.25 * hbm
        except Exception:
            pass
        return 4e9

    def _read_h5ad_cached(self, path):
        """mtime-invalidated single-entry-per-path h5ad cache — a consensus
        sweep over many K values re-reads the same norm_counts / tpm files
        (the full-gene tpm is hundreds of MB). Thread-safe: the TPM prefetch
        thread and the main thread may both populate it."""
        self._flush_pending_write(path)
        with _H5AD_LOCK:
            cache = getattr(self, "_h5ad_cache", None)
            if cache is None:
                cache = self._h5ad_cache = {}
            mtime = os.path.getmtime(path)
            hit = cache.get(path)
            if hit is not None and hit[0] == mtime:
                return hit[1]
        adata = read_h5ad(path)
        with _H5AD_LOCK:
            cache[path] = (mtime, adata)
        return adata

    def _stash_tpm_compact(self, tpm_adata, counts_X):
        """Keep a compact (integer counts + per-cell scale) image of the TPM
        so a same-process factorize can warm the consensus device TPM with a
        2-4x smaller upload and near-zero host work (ops/device_tpm). Keyed
        by a weakref to the exact object a later ``_read_h5ad_cached`` of the
        tpm path returns, so the device cache hits iff nothing rewrote the
        artifact. ``CNMF_TPU_DEVICE_TPM=0`` disables (restores the
        bit-identical float upload)."""
        if os.environ.get("CNMF_TPU_DEVICE_TPM", "1") != "1":
            return
        from cnmf_tpu.ops.device_tpm import (
            compact_integer_counts,
            tpm_row_scale,
        )

        ints = compact_integer_counts(counts_X)
        if ints is None:
            return
        scale = tpm_row_scale(counts_X).astype(self.compute_dtype)
        self._tpm_compact = (weakref.ref(tpm_adata), ints, scale)
        # the integer image is itself sparse on real scRNA counts: pre-build
        # CSR components here (off factorize's critical path) so the upload
        # ships 2-6x fewer bytes again and densifies on device
        # (ops/device_tpm.upload_int_image); identity-keyed to this stash
        from cnmf_tpu.ops.device_tpm import csr_upload_enabled, int_image_csr

        self._ints_csr = (
            (ints, int_image_csr(ints)) if csr_upload_enabled() else None
        )

    def _stash_norm_compact(self, norm_adata, counts_var_index):
        """Keep (cols, std) so a same-process factorize can DERIVE its input
        matrix on device from the integer counts already stashed for the TPM
        (ops/device_tpm.norm_from_counts) — the whole pipeline's host→device
        traffic then is one integer upload. Requires the TPM stash (same
        integer image) and uniquely-mapping gene names; degenerate (zero/
        non-finite std) genes fall back to the exact float upload.
        ``CNMF_TPU_DEVICE_NORM`` gates use at factorize time."""
        tstash = getattr(self, "_tpm_compact", None)
        if tstash is None:
            return
        from cnmf_tpu.ops.device_tpm import norm_column_spec

        ints = tstash[1]
        spec = norm_column_spec(
            counts_var_index, norm_adata.var.index, ints, self.compute_dtype,
            std=getattr(self, "_norm_scale_std", None),
        )
        if spec is None:
            return
        cols, std = spec
        self._norm_compact = (weakref.ref(norm_adata), ints, cols, std)

    def _fused_tpm_derive_target(self):
        """(tpm_adata, scale) when factorize should derive the consensus
        device TPM alongside its own input in ONE program, else
        ``(None, None)``. Mirrors the compact branch of
        ``_prefetch_tpm_async``: prefetch enabled, a live TPM stash at the
        compute dtype, the derived buffer under half the device limit, and
        the single-device layout (the cell-sharded mesh variant ships the
        image sharded from the prefetch thread instead)."""
        if os.environ.get("CNMF_TPU_PREFETCH_TPM", "1") != "1":
            return None, None
        stash = getattr(self, "_tpm_compact", None)
        if stash is None:
            return None, None
        ref, ints, scale = stash
        target = ref()
        derived_bytes = (
            ints.shape[0] * ints.shape[1] * self.compute_dtype.itemsize
        )
        if (
            target is None
            or scale.dtype != self.compute_dtype
            or derived_bytes >= 0.5 * self._tpm_device_limit()
            or (len(jax.devices()) > 1 and getattr(self, "shard_cells", True))
        ):
            return None, None
        return target, scale

    def _prefetch_tpm_async(self):
        """Warm the consensus-stage device TPM cache while factorize owns the
        wall clock.

        The full-gene TPM upload (~100 MB at PBMC scale; the relay link moves
        ~32 MB/s host→device, CLAUDE.md) otherwise lands in the middle of the
        first same-process consensus call. jax transfers are asynchronous, so
        dispatching the device_put from a daemon thread here overlaps both
        the h5ad read/densify AND the transfer with the factorize solver
        programs. Stage-per-process CLI runs get no benefit and skip nothing:
        consensus joins the thread (``_join_tpm_prefetch``) and falls back to
        its own upload when no prefetch ran. Disable with
        ``CNMF_TPU_PREFETCH_TPM=0``."""
        if os.environ.get("CNMF_TPU_PREFETCH_TPM", "1") != "1":
            return
        tpm_path = self.paths["tpm"]
        with _H5AD_LOCK:
            write_pending = tpm_path in (
                getattr(self, "_pending_writes", None) or {}
            )
        # an async prepare write still in flight (CNMF_TPU_ASYNC_WRITES=1)
        # owns the file's existence; the prefetch thread joins it below —
        # joining HERE (the main thread, at factorize start) would serialize
        # exactly the write the knob overlaps with the solver programs
        if not (write_pending or os.path.isfile(tpm_path)):
            return
        prev = getattr(self, "_tpm_prefetch_thread", None)
        if prev is not None and prev.is_alive():
            return  # an upload is already in flight

        def run():
            try:
                # compact path: prepare stashed an integer image of this
                # process's own TPM (ops/device_tpm) — upload THAT (2-4x
                # fewer bytes, no h5ad read-back, no pending-write join) and
                # expand on device. Keyed to the exact object a later
                # read-back returns, so a rewritten artifact falls through
                # to the float upload below.
                stash = getattr(self, "_tpm_compact", None)
                if stash is not None:
                    ref, ints, scale = stash
                    target = ref()
                    cached = getattr(self, "_tpm_dev_cache", None)
                    if (
                        target is not None
                        and cached is not None
                        and cached[0]() is target
                    ):
                        # factorize's fused derive already seeded the device
                        # TPM (derive_norm_and_tpm) — nothing to move
                        return
                    derived_bytes = (
                        ints.shape[0] * ints.shape[1]
                        * self.compute_dtype.itemsize
                    )
                    if (
                        target is not None
                        and scale.dtype == self.compute_dtype
                        and derived_bytes < 0.5 * self._tpm_device_limit()
                    ):
                        from cnmf_tpu.ops.device_tpm import tpm_from_counts

                        multi = (
                            len(jax.devices()) > 1
                            and getattr(self, "shard_cells", True)
                        )
                        if multi:
                            # consensus wants the TPM cell-SHARDED
                            # (parallel.mesh.put_cells layout): ship the
                            # INTEGER image sharded + padded and expand on
                            # device — same 2-4x link-byte win as the
                            # single-chip path (round-4 mesh extension).
                            # Zero pad rows expand to zero TPM rows, which
                            # every consensus consumer treats as neutral.
                            from cnmf_tpu.parallel.mesh import cell_sharding

                            n_dev = len(jax.devices())
                            pad = (-ints.shape[0]) % n_dev
                            ints_p = (
                                np.pad(ints, ((0, pad), (0, 0)))
                                if pad else ints
                            )
                            scale_p = (
                                np.pad(scale, (0, pad), constant_values=1)
                                if pad else scale
                            )
                            ints_dev = jax.device_put(
                                ints_p, cell_sharding(2)
                            )
                            scale_dev = jax.device_put(
                                scale_p, cell_sharding(1)
                            )
                        else:
                            # factorize may have ALREADY uploaded this
                            # integer image to derive its own input
                            # (CNMF_TPU_DEVICE_NORM) — reuse that device
                            # buffer: the TPM expansion then moves ZERO bulk
                            # bytes over the link
                            held = getattr(self, "_ints_dev", None)
                            if held is not None and held[0] is ints:
                                ints_dev = held[1]
                            else:
                                from cnmf_tpu.ops.device_tpm import (
                                    _COMPUTE_CSR,
                                    upload_int_image,
                                )

                                stashed_csr = getattr(self, "_ints_csr", None)
                                ints_dev, _ = upload_int_image(
                                    ints,
                                    stashed_csr[1]
                                    if stashed_csr is not None
                                    and stashed_csr[0] is ints
                                    else _COMPUTE_CSR,
                                )
                            scale_dev = jnp.asarray(scale)
                        self._device_cached(
                            "_tpm_dev_cache", target,
                            lambda: tpm_from_counts(ints_dev, scale_dev),
                        )
                        return
                self._flush_pending_write(tpm_path)
                # size gate before the bulk read: at atlas scale the dense
                # TPM exceeds the device budget and a full read of a
                # multi-GB h5ad would buy nothing. Stricter than the
                # consensus-time gate: the prefetched DEVICE buffer coexists
                # with factorize's solver working set (~4 GB budget), so
                # only upload TPMs up to HALF the usual device limit —
                # larger ones get a HOST-side read warm-up only (consensus's
                # sparse-products path consumes the host CSR directly, and
                # its h5ad read is ~11 s at the 100k×20k atlas scale; h5py
                # releases the GIL, so the read rides along under the
                # device-bound solver programs)
                from cnmf_tpu.io.h5ad import read_h5ad_shape
                n, g = read_h5ad_shape(tpm_path)
                to_device = (
                    n * g * self.compute_dtype.itemsize
                    < 0.5 * self._tpm_device_limit()
                )
                tpm = self._read_h5ad_cached(tpm_path)
                if to_device:
                    self._device_cached(
                        "_tpm_dev_cache", tpm,
                        lambda: self._to_device_dense(tpm.X),
                    )
            except Exception as exc:  # never fail factorize for a warm cache
                if os.environ.get("CNMF_TPU_TIMINGS", "0") == "1":
                    import sys
                    print(f"[cnmf-tpu timing] tpm prefetch skipped: {exc}",
                          file=sys.stderr, flush=True)

        thread = threading.Thread(target=run, name="cnmf-tpu-tpm-prefetch",
                                  daemon=True)
        self._tpm_prefetch_thread = thread
        # daemon threads die abruptly at interpreter teardown — mid-h5py-read
        # that can crash; atexit handlers run first, so join there for every
        # entry point (CLI stage-per-process runs, scripts, notebooks).
        # One bounded joiner per instance (not per call): repeated factorize
        # calls must not stack handlers, and a prefetch stalled on the relay
        # (link setup measured up to 400 s) must not wedge interpreter exit.
        if not getattr(self, "_tpm_prefetch_atexit", False):
            import atexit

            def _join_at_exit(ref=weakref.ref(self)):
                obj = ref()
                t = getattr(obj, "_tpm_prefetch_thread", None) if obj else None
                if t is not None:
                    t.join(timeout=10.0)

            atexit.register(_join_at_exit)
            self._tpm_prefetch_atexit = True
        thread.start()

    def _join_tpm_prefetch(self):
        thread = getattr(self, "_tpm_prefetch_thread", None)
        if thread is not None:
            thread.join()
            self._tpm_prefetch_thread = None

    # ==================================================================
    # prepare
    # ==================================================================

    @timed("prepare")
    def prepare(
        self,
        counts_fn,
        components,
        n_iter=100,
        densify=False,
        tpm_fn=None,
        seed=None,
        beta_loss="frobenius",
        num_highvar_genes=2000,
        genes_file=None,
        alpha_usage=0.0,
        alpha_spectra=0.0,
        init="random",
        max_NMF_iter=1000,
    ):
        """Load counts, select/normalize HVGs, and lay out the replicate grid.

        Produces the same six artifacts as the reference (cnmf.py:333-459):
        tpm + tpm_stats, norm_counts, the HVG list, the replicate-parameter
        table and the YAML solver kwargs.
        """
        # a prior prepare's async writes must land before this one's
        # overwrite them (and before the shutil.copy tpm branch bypasses the
        # writer queue)
        self.flush_writes()
        with stage_timer("prepare.load_counts"):
            input_counts = load_counts(counts_fn, densify=densify)
        if sp.issparse(input_counts.X) and densify:
            input_counts.X = np.asarray(input_counts.X.todense())

        self._tpm_compact = None  # a prior run's stash must never leak
        self._norm_compact = None
        self._ints_csr = None
        self._norm_scale_std = None
        if tpm_fn is None:
            with stage_timer("prepare.tpm"):
                tpm = AnnData(
                    normalize_total(input_counts.X, target_sum=1e6),
                    obs=input_counts.obs.copy(),
                    var=input_counts.var.copy(),
                )
            with stage_timer("prepare.write_tpm"):
                seeded = self._write_prepare_h5ad(self.paths["tpm"], tpm)
            with stage_timer("prepare.stash_tpm"):
                self._stash_tpm_compact(seeded, input_counts.X)
        elif tpm_fn.endswith(".h5ad"):
            shutil.copy(tpm_fn, self.paths["tpm"])
            tpm = read_h5ad(self.paths["tpm"])
        else:
            tpm = load_counts(tpm_fn, densify=densify)
            self._write_prepare_h5ad(self.paths["tpm"], tpm)

        # shape/sparsity note for factorize's cold-start auto-warm — lets
        # the same-process job builder avoid joining the async tpm write
        # just to read a header
        self._tpm_meta = (tpm.X.shape[1], sp.issparse(tpm.X))
        with stage_timer("prepare.tpm_stats"):
            gene_tpm_mean, gene_tpm_var = mean_var(tpm.X)
            gene_tpm_stddev = gene_tpm_var ** 0.5
            input_tpm_stats = pd.DataFrame(
                [gene_tpm_mean, gene_tpm_stddev],
                index=["__mean", "__std"],
                columns=tpm.var.index,
            ).T
            save_df_to_npz(input_tpm_stats, self.paths["tpm_stats"])

        if genes_file is not None:
            highvargenes = open(genes_file).read().rstrip().split("\n")
        else:
            highvargenes = None

        with stage_timer("prepare.norm_counts"):
            norm_counts = self.get_norm_counts(
                input_counts, tpm,
                num_highvar_genes=num_highvar_genes,
                high_variance_genes_filter=highvargenes,
                # tpm_stats just computed these exact ddof=0 moments — the
                # HVG selection must not pay a second full pass over the
                # (possibly GB-scale) TPM
                tpm_moments=(gene_tpm_mean, gene_tpm_var),
            )
        with stage_timer("prepare.write_norm_counts"):
            seeded_norm = self.save_norm_counts(norm_counts)
        with stage_timer("prepare.stash_norm"):
            self._stash_norm_compact(seeded_norm, input_counts.var.index)

        with stage_timer("prepare.iter_params"):
            (replicate_params, run_params) = self.get_nmf_iter_params(
                ks=components, n_iter=n_iter, random_state_seed=seed,
                beta_loss=beta_loss, alpha_usage=alpha_usage,
                alpha_spectra=alpha_spectra, init=init, max_iter=max_NMF_iter,
            )
            self.save_nmf_iter_params(replicate_params, run_params)

    def get_norm_counts(
        self, counts, tpm, high_variance_genes_filter=None,
        num_highvar_genes=None, tpm_moments=None,
    ) -> AnnData:
        """Subset to HVGs and scale genes to unit variance without centering
        (behavioral contract per reference cnmf.py:487-556: f64 cast,
        ddof=1 scaling, zero-std genes guarded only for sparse input, the
        HVG list file, and the zero-HVG-cell error).

        ``tpm_moments``: optional precomputed per-gene (mean, var) of
        ``tpm.X`` at ddof=0 — prepare passes the tpm_stats moments so the
        Fano HVG selection doesn't pay a second full pass over the TPM."""
        if high_variance_genes_filter is None:
            if tpm_moments is not None:
                from cnmf_tpu.ops.stats import fano_hvg_stats

                hvg_stats, _ = fano_hvg_stats(
                    tpm_moments[0], tpm_moments[1],
                    numgenes=num_highvar_genes,
                )
            else:
                hvg_stats, _ = get_highvar_genes(
                    tpm.X, numgenes=num_highvar_genes
                )
            high_variance_genes_filter = list(
                tpm.var.index[hvg_stats.high_var.values]
            )

        norm_counts = counts[:, high_variance_genes_filter].copy()
        # the reference only guards zero-std divisions on its sparse path
        # (scanpy pp.scale) and divides unguarded when dense — preserved
        sparse_input = sp.issparse(tpm.X)
        if sp.issparse(norm_counts.X):
            casted = norm_counts.X.astype(np.float64)
        else:
            # the f64 cast lands in a reused warm arena buffer and the
            # scale divides it in place — the norm stage's two fresh
            # GB-scale copies (astype + quotient) become zero (utils/arena;
            # values bit-identical either way)
            from cnmf_tpu.utils.arena import host_arena

            casted = host_arena.take(norm_counts.X.shape, np.float64)
            np.copyto(casted, norm_counts.X)
        norm_counts.X, hvg_std = scale_unit_variance(
            casted, ddof=1, zero_safe=sparse_input,
            return_std=True, inplace=True,
        )
        # the raw per-HVG std IS the divisor the device-norm derive needs —
        # retain it so _stash_norm_compact skips a second subset+std pass
        self._norm_scale_std = None if sparse_input else hvg_std
        values = norm_counts.X.data if sparse_input else norm_counts.X
        if np.isnan(values).any():
            print("Warning NaNs in normalized counts matrix")

        with open(self.paths["nmf_genes_list"], "w") as fh:
            fh.write("\n".join(high_variance_genes_filter))

        zero_cells = np.ravel(np.asarray(norm_counts.X.sum(axis=1)) == 0)
        if zero_cells.any():
            examples = norm_counts.obs.index[zero_cells]
            raise Exception(
                "Error: %d cells have zero counts of overdispersed genes. E.g. %s. "
                "Filter those cells and re-run or adjust the number of "
                "overdispersed genes. Quitting!"
                % (zero_cells.sum(), ", ".join(examples[:4]))
            )
        return norm_counts

    def _write_prepare_h5ad(self, path, adata):
        """Write a prepare-stage h5ad, optionally at a reduced storage dtype
        (CNMF_TPU_PREPARE_DTYPE=float32). The default keeps the reference's
        float64 on-disk contract; float32 halves the value bytes written —
        on an atlas-scale host whose disk sustains ~40-60 MB/s for GB-scale
        writes, that is nearly halving prepare wall time — while every
        solver consumes compute_dtype (f32 by default) downstream anyway.
        The IN-MEMORY matrix is untouched: HVG stats / tpm_stats keep full
        input precision; only the stored artifact narrows.

        ``CNMF_TPU_ASYNC_WRITES=1`` dispatches the write to a single background
        writer thread so the (possibly hundreds of MB, writeback-throttled)
        h5ad flush overlaps the device-bound factorize stage in a
        same-process pipeline. Ordering is preserved (one worker); every
        same-process read of these paths joins the pending write first
        (``_flush_pending_write``), and interpreter exit joins the writer
        pool, so stage-per-process CLI runs still see durable files. The
        knob relaxes only one semantic: ``prepare()`` RETURNING no longer
        implies the files are on disk, so a Python caller that launches
        EXTERNAL worker processes immediately after prepare() must call
        ``flush_writes()`` first — hence opt-in (default '0')."""
        dt = os.environ.get("CNMF_TPU_PREPARE_DTYPE", "")
        X = adata.X
        if dt and np.dtype(dt) != (X.data.dtype if sp.issparse(X) else
                                   np.asarray(X).dtype):
            dtype = np.dtype(dt)
            if sp.issparse(X):
                Xc = X.copy()
                Xc.data = Xc.data.astype(dtype)
            else:
                # the narrowed storage copy reuses a warm arena buffer —
                # this copy is retained by the h5ad read-cache seed below,
                # so the slot stays held (refcount-guarded) until the cache
                # entry itself is replaced
                from cnmf_tpu.utils.arena import host_arena

                Xs = np.asarray(X)
                Xc = host_arena.take(Xs.shape, dtype)
                np.copyto(Xc, Xs)
            adata = AnnData(X=Xc, obs=adata.obs, var=adata.var)

        def write_and_seed():
            write_h5ad(path, adata)
            # seed the read cache with the object just written (the narrowed
            # variant when the dtype knob is set — exactly what a fresh read
            # returns), so the same-process downstream stage skips the
            # read-back entirely
            with _H5AD_LOCK:
                cache = getattr(self, "_h5ad_cache", None)
                if cache is None:
                    cache = self._h5ad_cache = {}
                cache[path] = (os.path.getmtime(path), adata)

        if os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1":
            self._submit_pending_write(path, write_and_seed)
        else:
            write_and_seed()
        # the (possibly dtype-narrowed) object a same-process read-back
        # returns — callers keying device caches must use THIS identity
        return adata

    def _submit_pending_write(self, path, fn, extra_paths=()):
        """Queue ``fn`` on the single background writer thread and register
        it under ``path`` for join-on-read / flush-at-exit (the
        CNMF_TPU_ASYNC_WRITES machinery — one worker, so writes retain
        submission order). ``extra_paths``: additional paths the same ``fn``
        produces (flushing any of them joins the one future)."""
        import concurrent.futures

        with _H5AD_LOCK:
            pool = getattr(self, "_writer_pool", None)
            if pool is None:
                pool = self._writer_pool = (
                    concurrent.futures.ThreadPoolExecutor(
                        max_workers=1,
                        thread_name_prefix="cnmf-tpu-writer",
                    )
                )
            pending = getattr(self, "_pending_writes", None)
            if pending is None:
                pending = self._pending_writes = {}
            fut = pool.submit(fn)
            pending[path] = fut
            for p in extra_paths:
                pending[p] = fut

    def _hold_drain(self):
        """Register a hold gate for a deferred packed drain (see
        _drain_hold_seconds): the writer's d→h fetch waits on it so the bulk
        transfer takes its relay-channel slot AFTER the downstream stage's
        device dispatches/fetches. Released by _release_drains()."""
        gate = threading.Event()
        with _H5AD_LOCK:
            holds = getattr(self, "_drain_holds", None)
            if holds is None:
                holds = self._drain_holds = []
            holds.append(gate)
        return gate

    def _release_drains(self):
        """Open every held deferred drain — called when the pipeline is done
        with the device/channel for now (end of consensus / the K sweep), a
        reader needs the drained bytes, or a flush wants durability."""
        with _H5AD_LOCK:
            holds = getattr(self, "_drain_holds", None)
            if not holds:
                return
            self._drain_holds = []
        for gate in holds:
            gate.set()

    def _write_pending(self, path):
        """True iff a background write for ``path`` is queued/in flight —
        used where file EXISTENCE gates behavior (combine's per-iteration
        scan): a pending own write counts as existing."""
        with _H5AD_LOCK:
            return path in (getattr(self, "_pending_writes", None) or {})

    def _flush_pending_write(self, path):
        """Join the in-flight background write for ``path`` (if any),
        re-raising its exception at the consumer."""
        with _H5AD_LOCK:
            fut = (getattr(self, "_pending_writes", None) or {}).pop(path, None)
        if fut is not None:
            # the single writer runs FIFO: joining ANY queued write may block
            # behind a gate-held deferred drain — open the gates first
            self._release_drains()
            fut.result()

    def flush_writes(self):
        """Join every in-flight background artifact write
        (CNMF_TPU_ASYNC_WRITES=1), re-raising the first failure. Call before
        handing the run directory to another process."""
        self._release_drains()
        with _H5AD_LOCK:
            pending = getattr(self, "_pending_writes", None)
            futs = list(pending.items()) if pending else []
            if pending:
                pending.clear()
        for _, fut in futs:
            fut.result()

    def save_norm_counts(self, norm_counts: AnnData):
        self._initialize_dirs()
        return self._write_prepare_h5ad(
            self.paths["normalized_counts"], norm_counts
        )

    def get_nmf_iter_params(
        self, ks, n_iter=100, random_state_seed=None,
        beta_loss="kullback-leibler", alpha_usage=0.0, alpha_spectra=0.0,
        init="random", max_iter=1000,
    ):
        """Replicate-parameter grid with order-stable per-(K, iter) seeds.

        Determinism contract (reference cnmf.py:564-633): the master seed
        feeds the global numpy RNG, which draws one int seed per grid row in
        K-major/iter-minor order, so serial and worker-sharded runs produce
        identical spectra. Quirk kept: the seed vector is sized from the
        PRE-dedup ks length, so duplicate ks draw (unused) extra seeds.
        """
        ks = [ks] if type(ks) is int else ks
        np.random.seed(seed=random_state_seed)
        seeds = np.random.randint(low=1, high=(2**31) - 1, size=len(ks) * n_iter)

        grid = [
            (k, r)
            for k in sorted(set(list(ks)))
            for r in range(n_iter)
        ]
        replicate_params = pd.DataFrame(
            {
                "n_components": [k for k, _ in grid],
                "iter": [r for _, r in grid],
                "nmf_seed": seeds[: len(grid)],
                "completed": [
                    os.path.exists(self.paths["iter_spectra"] % kr) for kr in grid
                ],
            }
        )

        n_completed = replicate_params["completed"].sum()
        if n_completed > 0:
            warnings.warn(
                "{n} runs already appear completed. If this is unexpected, "
                "consider re-initializing the cnmf object with a different "
                "run name or output directory".format(n=n_completed),
                UserWarning,
            )

        run_params = dict(
            alpha_W=alpha_usage,
            alpha_H=alpha_spectra,
            l1_ratio=0.0,
            beta_loss=beta_loss,
            # CD is faster than MU but frobenius-only (reference cnmf.py:629-631)
            solver="cd" if beta_loss == "frobenius" else "mu",
            tol=1e-4,
            max_iter=max_iter,
            init=init,
        )
        return replicate_params, run_params

    def update_nmf_iter_params(self):
        """Re-scan disk for completed per-iteration spectra files and rewrite
        the replicate table — the resume/elasticity hook (reference
        cnmf.py:636-651)."""
        run_params = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )
        table = load_df_from_npz(self.paths["nmf_replicate_parameters"])
        table["completed"] = [
            os.path.exists(self.paths["iter_spectra"] % (row.n_components, row.iter))
            for row in table.itertuples()
        ]
        print(
            "{n} NMF runs are currently incomplete".format(
                n=int((~table["completed"].astype(bool)).sum())
            )
        )
        self.save_nmf_iter_params(table, run_params)

    def save_nmf_iter_params(self, replicate_params, run_params):
        self._initialize_dirs()
        save_df_to_npz(replicate_params, self.paths["nmf_replicate_parameters"])
        with open(self.paths["nmf_run_parameters"], "w") as F:
            yaml.dump(run_params, F)

    # ==================================================================
    # factorize
    # ==================================================================

    @timed("factorize")
    def factorize(
        self,
        worker_i=0,
        total_workers=1,
        skip_completed_runs=False,
        restart_chunk: Optional[int] = None,
        use_mesh: bool = True,
        verbose: bool = True,
    ):
        """Run the assigned NMF restarts as batched device programs.

        Jobs are still round-robin shardable across workers for CLI parity
        (reference cnmf.py:692-745), but within one worker all restarts for a
        given K execute as a single jitted program over the restart batch,
        sharded across local devices when ``use_mesh``. Spectra land in the
        same per-(K, iter) npz files.
        """
        run_params = load_df_from_npz(self.paths["nmf_replicate_parameters"])
        # consensus device buffers from a previous stage would compete with
        # the solver for HBM — drop them before (re)filling the h5ad cache
        self.clear_device_caches()
        norm_counts = self._read_h5ad_cached(self.paths["normalized_counts"])
        _nmf_kwargs = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )

        if not skip_completed_runs:
            jobs = list(worker_filter(range(len(run_params)), worker_i, total_workers))
        else:
            jobs = list(
                worker_filter(
                    run_params.index[run_params["completed"] == False],  # noqa: E712
                    worker_i, total_workers,
                )
            )
        if len(jobs) == 0:
            return

        # first device->host transfer of a process can pay a large one-time
        # link-setup cost on some TPU runtimes; absorb it on 4 bytes here
        # rather than on the first spectra fetch
        float(jnp.zeros(()))

        # cold start: AOT-compile this run's own programs in parallel
        # (joined) and the consensus programs in the background — see
        # _autowarm. No-op when warm, on CPU, or without a persistent
        # compilation cache.
        self._autowarm(
            norm_shape=norm_counts.X.shape,
            tpm_meta=getattr(self, "_tpm_meta", None),
        )

        # per-K (padded_k, n_iter_handle) records — bench.py derives analytic
        # CD FLOPs (4·N·G·K per sweep per restart) from these
        self._sweep_counts = []
        # optional wall-clock decomposition of factorize (upload / init /
        # dispatch / solve-wait / result-fetch / write + byte counts) for the
        # bench artifact; adds one tiny forcing fetch after the X upload, so
        # it is opt-in (bench.py sets the env)
        phases = (
            {"upload_s": 0.0, "init_s": 0.0, "dispatch_s": 0.0,
             "solve_wait_s": 0.0, "result_fetch_s": 0.0, "write_s": 0.0,
             "upload_bytes": 0, "result_bytes": 0}
            if os.environ.get("CNMF_TPU_PHASES", "0") == "1" else None
        )
        self._factorize_phases = phases
        # grid-path drain threads and the main dispatch loop update phases
        # concurrently — += on a dict entry is not atomic
        self._phases_lock = threading.Lock()
        import time as _time
        _tup = _time.perf_counter()

        from cnmf_tpu.ops.device_densify import device_densify_eligible

        if device_densify_eligible(
            norm_counts.X, self.compute_dtype, n_devices=len(jax.devices())
        ):
            # ship the CSR components and densify on device (~10× fewer
            # bytes over the link at atlas fill rates); the host keeps the
            # sparse form — every init path is sparse-aware, so no host
            # dense copy is ever materialized
            X = norm_counts.X
            Xd = self._to_device_dense(X)
            dense_bytes = (
                X.shape[0] * X.shape[1] * self.compute_dtype.itemsize
            )
            link_bytes = X.nnz * (self.compute_dtype.itemsize + 4)
        else:
            # threaded native CSR->dense with fused dtype cast (cnmf_tpu.native)
            # (the host copy stays: init paths and the x-mean scalar read it)
            X = densify_csr(norm_counts.X, out_dtype=self.compute_dtype)
            X = np.ascontiguousarray(X)
            Xd = None
            # derive the solver input ON DEVICE from the integer counts
            # stashed by this process's prepare (ops/device_tpm): the upload
            # shrinks to the uint8/int16 image — which the TPM prefetch then
            # REUSES, so the whole pipeline ships ONE compact matrix.
            # Values match the float upload to <=2 ulp; CNMF_TPU_DEVICE_NORM
            # ('1' force / '0' off / unset = TPU backend only) gates it.
            nstash = getattr(self, "_norm_compact", None)
            _env_dn = os.environ.get("CNMF_TPU_DEVICE_NORM", "")
            # (no device-count gate: the derived buffer has the same
            # default-device placement as the jnp.asarray upload it replaces)
            if (
                nstash is not None
                and (_env_dn == "1"
                     or (_env_dn != "0" and jax.default_backend() == "tpu"))
            ):
                ref, ints, cols, std = nstash
                if ref() is norm_counts and std.dtype == self.compute_dtype:
                    from cnmf_tpu.ops.device_tpm import (
                        _COMPUTE_CSR,
                        derive_norm_and_tpm,
                        norm_from_counts,
                        upload_int_image,
                    )

                    stashed_csr = getattr(self, "_ints_csr", None)
                    ints_dev, int_bytes = upload_int_image(
                        ints,
                        stashed_csr[1]
                        if stashed_csr is not None and stashed_csr[0] is ints
                        else _COMPUTE_CSR,
                    )
                    # the prefetch thread reads this AFTER factorize starts
                    # it, so publish before _prefetch_tpm_async below
                    self._ints_dev = (ints, ints_dev)
                    link_bytes = int_bytes + cols.nbytes + std.nbytes
                    # when the same-process TPM prefetch would expand this
                    # image anyway (single-device layout), derive BOTH
                    # outputs in ONE program (ops/device_tpm
                    # .derive_norm_and_tpm) — one less cold compile and one
                    # less warm dispatch; the prefetch thread then hits the
                    # seeded device cache and moves nothing
                    tpm_target, tpm_scale = self._fused_tpm_derive_target()
                    if tpm_target is not None:
                        Xd, tpm_dev = derive_norm_and_tpm(
                            ints_dev, jnp.asarray(cols), jnp.asarray(std),
                            jnp.asarray(tpm_scale),
                        )
                        self._device_cached(
                            "_tpm_dev_cache", tpm_target, lambda: tpm_dev
                        )
                        link_bytes += tpm_scale.nbytes
                    else:
                        Xd = norm_from_counts(
                            ints_dev, jnp.asarray(cols), jnp.asarray(std)
                        )
            if Xd is None:
                Xd = jnp.asarray(X)
                link_bytes = X.nbytes
            dense_bytes = X.nbytes
        if phases is not None:
            # force the upload to completion with a 4-byte dependent fetch
            # (block_until_ready does not force completion through the relay)
            float(jnp.sum(Xd[0, :1]))
            phases["upload_s"] = _time.perf_counter() - _tup
            phases["upload_bytes"] = int(link_bytes)
        # seed the consensus-stage cache: a same-process consensus /
        # k_selection sweep reuses this device buffer instead of paying the
        # densify + upload again (skipped at atlas scale to not pin HBM, and
        # on multi-device hosts where consensus wants a cell-SHARDED buffer,
        # not this replicated one)
        # restart-axis mesh: replicate X across the devices ONCE here — the
        # per-K shard_map solves (solvers.solve_nmf_sharded_device) then
        # reuse the placement instead of re-broadcasting every K.
        # cell-sharded meshes place X's rows over the cell axis instead
        # (the GSPMD solves' input layout, solvers.solve_nmf_batch_sharded_
        # seeded) — either way one placement pass serves every K
        if use_mesh and len(jax.devices()) > 1 and isinstance(Xd, jax.Array):
            from jax.sharding import NamedSharding, PartitionSpec as _P

            _mesh0 = build_mesh()
            if _mesh0.shape["cell"] == 1:
                Xd = jax.device_put(Xd, NamedSharding(_mesh0, _P()))
            else:
                # zero-pad rows to the cell-shard multiple (committed arrays
                # need even shards); the GSPMD seeded solver masks the
                # matching W rows to zero — exactly neutral — and slices
                # its outputs back (solvers.solve_nmf_batch_sharded_seeded)
                _pad = (-Xd.shape[0]) % _mesh0.shape["cell"]
                if _pad:
                    Xd = jnp.pad(Xd, ((0, _pad), (0, 0)))
                Xd = jax.device_put(
                    Xd, NamedSharding(_mesh0, _P("cell", None))
                )
        if dense_bytes < 2e9 and len(jax.devices()) == 1:
            self._device_cached("_norm_counts_dev_cache", norm_counts, lambda: Xd)

        # warm the consensus-stage device TPM behind the solver programs
        # (the thread's h5ad read delays its device_put past Xd's transfer,
        # so the first solve never queues behind the big upload)
        self._prefetch_tpm_async()

        gene_index = norm_counts.var.index
        sub = run_params.iloc[jobs]
        # Zero-padding K to a bucket (next multiple of 8) is an exact no-op for
        # both solvers — CD skips columns whose gram diagonal is 0 and MU keeps
        # zero factors at zero — so every K in a bucket shares one compiled
        # program instead of one XLA compilation per K.
        #
        # Two-phase pipelining: all K solves are DISPATCHED first (jax
        # dispatch is async, so the device crunches K_i while the host
        # initializes K_{i+1}); fetches + file writes drain afterwards.
        from concurrent.futures import ThreadPoolExecutor

        # Holding every K's factor buffers on device at once costs
        # ~2·Σ_K B·N·pad_K floats; only pipeline when that fits comfortably,
        # otherwise drain each K before dispatching the next (atlas scale).
        n_cells = X.shape[0]
        total_padk = sum(
            -(-int(kk) // 8) * 8 * len(gg)
            for kk, gg in sub.groupby("n_components", sort=True)
        )
        pipeline_all = (
            2 * total_padk * n_cells * np.dtype(self.compute_dtype).itemsize < 2e9
        )

        pending = []
        deferred_writes = []  # (k, write futures, batch, gene_index)
        with ThreadPoolExecutor(max_workers=8) as pool:

            def _settle_writes():
                # join the in-flight per-iteration writes and memoize each
                # K's stack (write-time stats validate the memo); runs inside
                # the pool's lifetime on EVERY exit path
                while deferred_writes:
                    k_, futs, batch, gidx, dev_ = deferred_writes.pop(0)
                    _tw = _time.perf_counter()
                    stats = [f.result() for f in futs]
                    self._memo_spectra_stack(k_, stats, batch, gidx, dev=dev_)
                    if phases is not None:
                        with self._phases_lock:
                            phases["write_s"] += _time.perf_counter() - _tw

            def drain(k, iters, handles):
                # handles are (B_chunk, pad_k, G) — transposed ON DEVICE and
                # already streaming host-ward via copy_to_host_async, so this
                # np.asarray is usually a wait on bytes in flight, overlapped
                # with the later Ks' device solves
                if phases is not None:
                    _t0 = _time.perf_counter()
                    for Ht in handles:
                        if isinstance(Ht, jax.Array):
                            # 4-byte dependent fetch = solve-completion barrier
                            float(jnp.sum(Ht[0, 0, :1]))
                    _t1 = _time.perf_counter()
                    with self._phases_lock:
                        phases["solve_wait_s"] += _t1 - _t0
                arrs = [np.asarray(Ht) for Ht in handles]
                spectra_batch = (
                    arrs[0][:, :k, :] if len(arrs) == 1
                    else np.concatenate([a[:, :k, :] for a in arrs], axis=0)
                )
                if (
                    spectra_batch.base is not None
                    and spectra_batch.nbytes < spectra_batch.base.nbytes
                ):
                    # own the k-slice: memoizing a view of the (B, pad_k, G)
                    # fetch buffer (or of a grid bucket's merged batch) would
                    # pin the whole base array in the stack memo — up to ~78%
                    # over the memo's byte accounting at pad 16 / k 9
                    spectra_batch = spectra_batch.copy()
                if phases is not None:
                    _t2 = _time.perf_counter()
                    with self._phases_lock:
                        phases["result_fetch_s"] += _t2 - _t1
                        phases["result_bytes"] += sum(
                            int(np.prod(a.shape)) * a.itemsize for a in arrs
                        )

                _submit_writes(k, iters, spectra_batch)
                if phases is not None:
                    with self._phases_lock:
                        phases["write_s"] += _time.perf_counter() - _t2

            def _submit_writes(k, iters, spectra_batch, dev=None):
                def write_one(args, k=k, spectra_batch=spectra_batch):
                    i, it = args
                    # stored at the solver's dtype: an f64 upcast would add
                    # only zero mantissa bits while doubling the bytes
                    # written AND faulting ~130 MB of fresh pages per K grid
                    # (first-touch on this class of host measures ~20x the
                    # warm-copy cost)
                    spectra = pd.DataFrame(
                        spectra_batch[i],
                        index=np.arange(1, k + 1),
                        columns=gene_index,
                    )
                    path = self.paths["iter_spectra"] % (k, it)
                    st = save_df_to_npz(spectra, path)
                    self._memo_artifact(path, spectra, spectra.values.nbytes, stat=st)
                    return int(it), path, st

                if (
                    pipeline_all
                    and os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1"
                ):
                    # CNMF_TPU_ASYNC_WRITES: the per-iteration npz writes ride
                    # the background writer thread PAST factorize's return, so
                    # the last K's write tail (~0.9 s at bench scale) overlaps
                    # consensus's device programs instead of sitting on the
                    # factorize critical path. The K-stack memo is populated
                    # NOW with PENDING stats (the batch is authoritative while
                    # our own writes are in flight — same sentinel as the
                    # async combine), so a same-process combine needs no join;
                    # its file-existence scan counts pending paths as
                    # existing (_write_pending). Durability semantics are the
                    # knob's documented contract: flush_writes()/CLI-exit
                    # joins everything.
                    stats = [
                        (int(it), self.paths["iter_spectra"] % (k, int(it)),
                         self._PENDING_STAT)
                        for it in iters
                    ]
                    if self._memo_spectra_stack(
                        k, stats, spectra_batch, gene_index, dev=dev
                    ):
                        for i, it in enumerate(iters):
                            path = self.paths["iter_spectra"] % (k, int(it))

                            def write_iter(i=i, it=int(it), path=path, k=k,
                                           spectra_batch=spectra_batch):
                                # frame construction happens HERE, on the
                                # writer thread — off the factorize tail
                                spectra = pd.DataFrame(
                                    spectra_batch[i],
                                    index=np.arange(1, k + 1),
                                    columns=gene_index,
                                )
                                st = save_df_to_npz(spectra, path)
                                self._memo_artifact(
                                    path, spectra, spectra.values.nbytes,
                                    stat=st,
                                )
                                self._settle_stack_stat(k, it, path, st)

                            self._submit_pending_write(path, write_iter)
                        return
                    # stack memo declined (byte cap): a same-process combine
                    # would have to read the FILES, so fall through to the
                    # durable-before-return paths below
                if pipeline_all:
                    # submit-and-move-on: the npz writes ride the pool while
                    # the main thread waits on the NEXT K's solve/fetch (GIL
                    # released in the transfer wait) — only the tail of the
                    # LAST K's writes lands on the factorize critical path
                    # (settled in the finally below; files are durable before
                    # factorize returns, no semantic change)
                    futs = [
                        pool.submit(write_one, (i, it))
                        for i, it in enumerate(iters)
                    ]
                    deferred_writes.append(
                        (k, futs, spectra_batch, gene_index, dev)
                    )
                else:
                    stats = list(pool.map(write_one, enumerate(iters)))
                    self._memo_spectra_stack(k, stats, spectra_batch,
                                             gene_index, dev=dev)

            def drain_packed(entries, packed):
                # one packed (Σ B·k, G) buffer per pad bucket
                # (ops.nmf.pack_spectra_true_k) — one transfer, split back
                # per K by zero-copy reshape (no padded rows to slice off,
                # so no ownership copy is needed either)
                _t1 = None
                if phases is not None:
                    _t0 = _time.perf_counter()
                    if isinstance(packed, jax.Array):
                        float(jnp.sum(packed[0, :1]))
                    _t1 = _time.perf_counter()
                    with self._phases_lock:
                        phases["solve_wait_s"] += _t1 - _t0
                arr = np.asarray(packed)
                if phases is not None:
                    _t2 = _time.perf_counter()
                    with self._phases_lock:
                        phases["result_fetch_s"] += _t2 - _t1
                        phases["result_bytes"] += arr.nbytes
                _tw = _time.perf_counter()
                G = arr.shape[1]
                off = 0
                # only pin the packed buffer in HBM when a downstream stage
                # can actually consume the twin — with the knob off,
                # _device_spectra_twin always returns None and holding the
                # handle would keep ~65 MB (bench) / more (atlas) live for
                # the process lifetime
                keep_dev = (
                    isinstance(packed, jax.Array) and device_spectra_enabled()
                )
                for k, iters in entries:
                    B = len(iters)
                    _submit_writes(
                        k, iters, arr[off:off + B * k].reshape(B, k, G),
                        # device twin: this K's true-K rows inside the packed
                        # device buffer — a same-process consensus can consume
                        # them without re-uploading (CNMF_TPU_DEVICE_SPECTRA)
                        dev=(packed, off, B * k) if keep_dev else None,
                    )
                    off += B * k
                if phases is not None:
                    with self._phases_lock:
                        phases["write_s"] += _time.perf_counter() - _tw

            def defer_packed(entries, packed):
                """Deferred packed drain (CNMF_TPU_ASYNC_WRITES=1): register
                the K-stack memos with _PendingBatch placeholders + PENDING
                per-iteration stats, register every per-iteration path
                against ONE writer-thread future, and return WITHOUT joining
                the d→h transfer — factorize ends at solve completion and
                the 64.8 MB-class result stream overlaps combine/consensus
                (the probe split: ~1.6 s device vs 2.3-11 s drain at bench
                scale). The writer task lands the bytes, settles each
                placeholder (readers unblock before the file writes), then
                writes the per-iteration npz files and settles their stats."""
                G = int(packed.shape[1])
                itemsize = packed.dtype.itemsize
                registered = []
                paths_all = []
                off = 0
                for k, iters in entries:
                    B = len(iters)
                    pb = _PendingBatch((B, k, G), B * k * G * itemsize)
                    stats = [
                        (int(it), self.paths["iter_spectra"] % (k, int(it)),
                         self._PENDING_STAT)
                        for it in iters
                    ]
                    ok = self._memo_spectra_stack(
                        k, stats, pb, gene_index, dev=(packed, off, B * k)
                    )
                    registered.append(
                        (k, [int(it) for it in iters], off, B,
                         pb if ok else None)
                    )
                    paths_all.extend(p for _, p, _ in stats)
                    off += B * k
                if phases is not None:
                    with self._phases_lock:
                        phases["result_bytes"] += off * G * itemsize
                hold_s = _drain_hold_seconds()
                gate = self._hold_drain() if hold_s > 0 else None

                def drain_task():
                    if gate is not None:
                        # sequence the bulk d→h transfer BEHIND the next
                        # stage's device dispatches/fetches on the relay's
                        # ordered channel (released at end-of-consensus /
                        # end-of-sweep / any reader join / flush; the
                        # timeout bounds a caller that never does any)
                        gate.wait(hold_s)
                    try:
                        arr = np.asarray(packed)
                    except BaseException:
                        # leave every placeholder empty and drop the stale
                        # memo entries: readers fall back to the files, whose
                        # reads join THIS future and re-raise the real error
                        with _MEMO_LOCK:
                            memo = getattr(self, "_stack_memo", None)
                            for k, _, _, _, pb in registered:
                                if pb is None or memo is None:
                                    continue
                                entry = memo.get(k)
                                if entry is not None and entry[2] is pb:
                                    del memo[k]
                                    self._stack_memo_bytes -= pb.nbytes
                        for *_, pb in registered:
                            if pb is not None:
                                pb.event.set()
                        raise
                    # settle EVERY placeholder before any file write — a
                    # blocked combine/consensus unblocks as soon as the
                    # bytes land
                    for k, iters, off_, B, pb in registered:
                        if pb is None:
                            continue
                        batch = arr[off_:off_ + B * k].reshape(B, k, G)
                        pb.value = batch
                        with _MEMO_LOCK:
                            memo = getattr(self, "_stack_memo", None)
                            entry = memo.get(k) if memo else None
                            if entry is not None and entry[2] is pb:
                                memo[k] = (entry[0], entry[1], batch,
                                           entry[3])
                        pb.event.set()
                    for k, iters, off_, B, pb in registered:
                        batch = arr[off_:off_ + B * k].reshape(B, k, G)
                        for i, it in enumerate(iters):
                            path = self.paths["iter_spectra"] % (k, it)
                            spectra = pd.DataFrame(
                                batch[i],
                                index=np.arange(1, k + 1),
                                columns=gene_index,
                            )
                            st = save_df_to_npz(spectra, path)
                            self._memo_artifact(
                                path, spectra, spectra.values.nbytes, stat=st
                            )
                            self._settle_stack_stat(k, it, path, st)

                self._submit_pending_write(
                    paths_all[0], drain_task, extra_paths=paths_all[1:]
                )

            # --- staged path (CNMF_TPU_STAGED): phase 1 = the per-K batched
            # dispatches below (natural early exit per K), then the
            # stragglers of ALL Ks merge into one ladder-compacted
            # continuation (ops.nmf.nmf_cd_staged) — device sweeps track the
            # n_iter tail instead of paying each K batch's slowest restart
            # (measured 2.64x executed-vs-useful FLOPs at PBMC scale) ---
            use_staged = (
                os.environ.get("CNMF_TPU_STAGED", "0") == "1"
                and pipeline_all
                and restart_chunk is None
                and not (use_mesh and len(jax.devices()) > 1)
                and _nmf_kwargs.get("solver", "cd") == "cd"
                and beta_loss_to_float(
                    _nmf_kwargs.get("beta_loss", "frobenius")
                ) == 2.0
            )
            if use_staged:
                init = _nmf_kwargs.get("init", "random")
                dtype = self.compute_dtype
                device_init = init == "random" and device_init_enabled()
                x_mean = self._x_mean_for_init(X, dtype) if device_init else None
                entries = [(int(k), g) for k, g in
                           sub.groupby("n_components", sort=True)]
                if verbose:
                    print(
                        "[Worker %d] factorizing k=%s: %d restarts, staged "
                        "tail-compacted schedule" % (
                            worker_i, ",".join(str(k) for k, _ in entries),
                            sum(len(g) for _, g in entries),
                        )
                    )
                _t0g = _time.perf_counter()
                inits = [
                    self._build_restart_init(
                        X, k, g["nmf_seed"].values, init, -(-k // 8) * 8,
                        device_init, x_mean, dtype,
                    )
                    for k, g in entries
                ]
                _t1g = _time.perf_counter()
                if phases is not None:
                    with self._phases_lock:
                        phases["init_s"] += _t1g - _t0g
                outs = solve_nmf_staged(Xd, inits, _nmf_kwargs)
                if phases is not None:
                    with self._phases_lock:
                        phases["solve_wait_s"] += _time.perf_counter() - _t1g
                for (k, g), (spec, n_iter_h) in zip(entries, outs):
                    self._sweep_counts.append((spec.shape[1], n_iter_h))
                    # result_bytes counted once inside drain (spec is
                    # already host-resident, so drain's asarray is free)
                    drain(k, g["iter"].values, [spec])
                _settle_writes()
                return

            # --- merged-grid path (OPT-IN, CNMF_TPU_GRID=1): all restarts
            # sharing a pad-K bucket solve as ONE tail-compacted schedule
            # (ops.nmf.nmf_cd_grid). MEASURED A LOSS on the relay-attached
            # v5e (17-18 s vs 8.7-10.7 s per-K, 3-round A/B): merging couples
            # fast-converging Ks (K=10 exits at 36 sweeps) to the slow ones
            # until the lagged ladder shrink catches up, losing more than the
            # per-K batches' natural early exit already saves, and the
            # per-segment done-mask reads sync through the relay. Kept for
            # re-evaluation on directly-attached chips (exact — pinned by
            # tests/test_grid_solver.py) ---
            use_grid = (
                os.environ.get("CNMF_TPU_GRID", "0") == "1"
                and pipeline_all
                and restart_chunk is None
                and not (use_mesh and len(jax.devices()) > 1)
                and _nmf_kwargs.get("solver", "cd") == "cd"
                and beta_loss_to_float(
                    _nmf_kwargs.get("beta_loss", "frobenius")
                ) == 2.0
            )
            # (A bucket-merged DEVICE-ladder variant — all restarts sharing
            # a pad-K bucket as ONE ladder program through this plumbing —
            # was measured a LOSS vs the per-K device ladder: 1.63 s vs
            # 1.19 s on the pad-16 bucket, real norm_counts. Merging
            # executes MORE restart-sweeps (147.6k vs 136.5k — fast Ks ride
            # the 504-wide early stages until the halving rungs catch up)
            # and runs each less efficiently (11.0 vs 8.7 µs/restart-sweep
            # at B=504 vs 104). Device-efficiency loss, not a relay
            # artifact, so the per-K ladder in _factorize_one_k stays the
            # default schedule.)
            if use_grid:
                buckets = {}
                for k, group in sub.groupby("n_components", sort=True):
                    k = int(k)
                    buckets.setdefault(-(-k // 8) * 8, []).append((k, group))
                init = _nmf_kwargs.get("init", "random")
                dtype = self.compute_dtype
                device_init = init == "random" and device_init_enabled()
                x_mean = self._x_mean_for_init(X, dtype) if device_init else None
                drain_threads = []
                for pad_k, entries in sorted(buckets.items()):
                    if verbose:
                        print(
                            "[Worker %d] factorizing k=%s: %d restarts as one "
                            "tail-compacted device schedule" % (
                                worker_i, ",".join(str(k) for k, _ in entries),
                                sum(len(g) for _, g in entries),
                            )
                        )
                    _t0g = _time.perf_counter()
                    inits = [
                        self._build_restart_init(
                            X, k, g["nmf_seed"].values, init, pad_k,
                            device_init, x_mean, dtype,
                        )
                        for k, g in entries
                    ]
                    if isinstance(inits[0][0], jax.Array):
                        W0m = jnp.concatenate([w for w, _ in inits], axis=0)
                        Ht0m = jnp.concatenate([h for _, h in inits], axis=0)
                    else:
                        W0m = np.concatenate([w for w, _ in inits], axis=0)
                        Ht0m = np.concatenate([h for _, h in inits], axis=0)
                    del inits
                    _t1g = _time.perf_counter()
                    if phases is not None:
                        with self._phases_lock:
                            phases["init_s"] += _t1g - _t0g
                    spec, n_iter_h = solve_nmf_grid(Xd, W0m, Ht0m, _nmf_kwargs)
                    if phases is not None:
                        # result_bytes counted once inside drain
                        with self._phases_lock:
                            phases["solve_wait_s"] += _time.perf_counter() - _t1g
                    self._sweep_counts.append((pad_k, n_iter_h))
                    off = 0
                    slices = []
                    for k, g in entries:
                        Bk = len(g)
                        slices.append((k, g["iter"].values,
                                       [spec[off:off + Bk]]))
                        off += Bk
                    # write from a side thread so the next bucket's schedule
                    # dispatches immediately
                    t = threading.Thread(
                        target=lambda sl=slices: [drain(*args) for args in sl],
                        name="cnmf-tpu-grid-drain",
                    )
                    t.start()
                    drain_threads.append(t)
                for t in drain_threads:
                    t.join()
                _settle_writes()
                return

            # Pack each pad bucket's true-K results into ONE device buffer
            # and ONE d→h transfer (pack_spectra_true_k): the per-K slice
            # dispatches were 8 distinct cold XLA compiles (~6.5 s through
            # axon's remote compiler) and 9 transfer round trips on the
            # relay's single ordered channel; packed it is one compile +
            # one transfer per bucket. Mesh/chunked paths keep the per-K
            # slice-and-drain.
            pack_ok = (
                pipeline_all
                and restart_chunk is None
                and not (use_mesh and len(jax.devices()) > 1)
            )
            # CNMF_TPU_PACK_ALL='1' (default): merge EVERY bucket's true-K
            # rows into ONE pack program and ONE d→h transfer — the round-3
            # probe measured the serial per-slice drain at ~9 MB/s in
            # congested relay windows, where fewer/larger transfer ops are
            # worth ~10x; the per-bucket variant ('0') instead starts each
            # bucket's bytes moving while the next bucket solves.
            pack_all = (
                pack_ok and os.environ.get("CNMF_TPU_PACK_ALL", "1") == "1"
            )
            defer_ok = (
                os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1"
                and device_spectra_enabled()
            )
            # a gate-held deferred drain schedules its own transfer LAST
            # (see _drain_hold_seconds) — starting the copy eagerly here
            # would defeat the hold by claiming the channel slot at pack time
            hold_drain = defer_ok and _drain_hold_seconds() > 0
            all_handles = []
            buckets = {}
            for k, group in sub.groupby("n_components", sort=True):
                k = int(k)
                buckets.setdefault(-(-k // 8) * 8, []).append((k, group))
            for pad_k, entries in sorted(buckets.items()):
                handles_k = []
                for k, group in entries:
                    seeds = group["nmf_seed"].values
                    if verbose:
                        print(
                            "[Worker %d] factorizing k=%d: %d restarts as one device batch"
                            % (worker_i, k, len(seeds))
                        )
                    handles = self._factorize_one_k(
                        Xd, X, k, seeds, _nmf_kwargs, pad_k=pad_k,
                        restart_chunk=restart_chunk, use_mesh=use_mesh,
                        fetch=False, slice_k=not pack_ok,
                    )
                    handles_k.append((k, group["iter"].values, handles))
                packable = pack_ok and all(
                    len(hs) == 1 and isinstance(hs[0], jax.Array)
                    for _, _, hs in handles_k
                )
                if packable and pack_all:
                    all_handles.extend(handles_k)
                elif packable:
                    packed = pack_spectra_true_k(
                        tuple(hs[0] for _, _, hs in handles_k),
                        ks=tuple(k for k, _, _ in handles_k),
                    )
                    if not hold_drain:
                        try:
                            # start the bucket's bytes moving NOW — the
                            # transfer rides the relay while the next bucket
                            # solves
                            packed.copy_to_host_async()
                        except Exception:
                            pass
                    pending.append(
                        ([(k, iters) for k, iters, _ in handles_k], packed)
                    )
                else:
                    for k, iters, handles in handles_k:
                        if pipeline_all:
                            pending.append((k, iters, handles))
                        else:
                            drain(k, iters, handles)

            if all_handles:
                packed = pack_spectra_true_k(
                    tuple(hs[0] for _, _, hs in all_handles),
                    ks=tuple(k for k, _, _ in all_handles),
                )
                if not hold_drain:
                    try:
                        packed.copy_to_host_async()
                    except Exception:
                        pass
                pending.append(
                    ([(k, iters) for k, iters, _ in all_handles], packed)
                )

            for item in pending:
                if len(item) == 2:
                    if defer_ok and isinstance(item[1], jax.Array):
                        defer_packed(*item)
                    else:
                        drain_packed(*item)
                else:
                    drain(*item)
            _settle_writes()

    @staticmethod
    def _x_mean_for_init(X_host, dtype):
        """Global mean of X at the solver dtype's accumulation order — the
        scalar the on-device random init scales by (sklearn init parity)."""
        if sp.issparse(X_host):
            # same cast-then-accumulate order as the dense branch (whose
            # X_host was already cast to compute_dtype by densify_csr)
            return float(
                np.sum(X_host.data.astype(dtype), dtype=np.float64)
            ) / (X_host.shape[0] * X_host.shape[1])
        return float(np.mean(X_host, dtype=np.float64))

    def _build_restart_init(self, X_host, k, seeds, init, pad_k,
                            device_init, x_mean, dtype):
        """Per-restart initial factors (W0 (B,N,pad_k), Ht0 (B,G,pad_k)) —
        device arrays under device_init, host arrays otherwise; padded
        component columns are zero (exact no-op for both solvers)."""
        if device_init:
            return random_init_batch_device(
                x_mean, X_host.shape[0], X_host.shape[1], k,
                seeds, pad_k=pad_k, dtype=dtype,
            )
        if init == "random":
            W0, Ht0 = random_init_batch(X_host, k, seeds, dtype=dtype)
        elif init in ("nndsvd", "nndsvda", "nndsvdar"):
            # per-replicate seeds: sklearn's nndsvd runs a SEEDED randomized
            # SVD, so the reference's restarts genuinely differ — one init
            # per seed, not a broadcast (reference cnmf.py:738 sets each
            # run's random_state)
            inits = [
                nndsvd_init(X_host, k, dtype=dtype, variant=init,
                            seed=int(s))
                for s in seeds
            ]
            W0 = np.stack([w for w, _ in inits])
            Ht0 = np.stack([np.ascontiguousarray(h.T) for _, h in inits])
        else:
            raise ValueError(f"unsupported init: {init}")
        if pad_k > k:
            W0 = np.pad(W0, ((0, 0), (0, 0), (0, pad_k - k)))
            Ht0 = np.pad(Ht0, ((0, 0), (0, 0), (0, pad_k - k)))
        return W0, Ht0

    def _factorize_one_k(
        self, Xd, X_host, k, seeds, nmf_kwargs, pad_k=None,
        restart_chunk=None, use_mesh=True, fetch=True, slice_k=True,
    ):
        """All restarts for one K: init on host (sklearn-RNG-compatible),
        solve batched on device. Returns spectra (B, k, G), or — with
        ``fetch=False`` — per-chunk (B, pad_k, G) device-transposed spectra
        handles (host copies already in flight) so the caller can overlap
        subsequent host work with the device solve and the result transfer.

        ``pad_k``: zero-pad the component axis to this width so different K
        values reuse one compiled program (exact no-op, see factorize()).
        ``slice_k=False`` (with ``fetch=False``): skip the per-K true-k
        device slice and the async host copy — the caller packs the whole
        pad bucket into one transfer (ops.nmf.pack_spectra_true_k)."""
        import time as _time

        trace = os.environ.get("CNMF_TPU_TIMINGS", "0") == "1"
        init = nmf_kwargs.get("init", "random")
        dtype = self.compute_dtype
        B = len(seeds)
        pad_k = pad_k or k
        if restart_chunk is None:
            # keep the restart batch's solver working set (W, XHt, grads ≈
            # 4 × B×N×K buffers) within ~4 GB of HBM; at PBMC scale this
            # never chunks, at atlas scale (1M cells, K≈60) it does
            per_restart = X_host.shape[0] * pad_k * np.dtype(dtype).itemsize * 4
            restart_chunk = max(1, int(4e9 / max(per_restart, 1)))
        chunk = min(restart_chunk, B)

        multi_device = use_mesh and len(jax.devices()) > 1
        mesh = build_mesh() if multi_device else None
        # On the TPU backend, generate the random init ON DEVICE from the
        # replicate seeds (ops/init.py): the host path ships ~30 MB of noise
        # per K over a link measured at ~32 MB/s. On a restart-axis mesh the
        # init + ladder both run inside ONE shard_map program
        # (solvers.solve_nmf_sharded_device) — only the seed vector crosses
        # the link; cell-sharded meshes run the GSPMD seeded twin below
        # (solvers.solve_nmf_batch_sharded_seeded), so no host noise crosses
        # the link on ANY mesh shape.
        sharded_device_path = (
            multi_device
            and init == "random"
            and device_init_enabled()
            and device_ladder_enabled()
            and mesh.shape["cell"] == 1
        )
        # cell-sharded meshes (atlas configs on a pod) get the GSPMD twin:
        # device init constrained to the factorize shardings + the plain
        # batched solver in ONE program (solvers.solve_nmf_batch_sharded_
        # seeded) — no host noise crosses the link on ANY mesh shape now
        # (round-4 VERDICT #1; the ladder's argsort re-pack would shuffle
        # restart shards across devices, so cell>1 keeps the plain schedule)
        gspmd_seeded_path = (
            multi_device
            and init == "random"
            and device_init_enabled()
            and mesh.shape["cell"] != 1
        )
        device_init = (
            init == "random" and device_init_enabled() and not multi_device
        )
        x_mean = (
            self._x_mean_for_init(X_host, dtype)
            if (device_init or sharded_device_path or gspmd_seeded_path)
            else None
        )
        # single-device twin of the sharded path: init + ladder fused into
        # one program (solvers._seeded_ladder) — one compile per pad bucket
        # cold, one dispatch per K warm, identical factors
        seeded_single = (
            device_init
            and device_ladder_enabled()
            and os.environ.get("CNMF_TPU_COMPACT", "0") != "1"
        )

        out = []
        for start in range(0, B, chunk):
            _t0 = _time.perf_counter()
            chunk_seeds = seeds[start:start + chunk]
            Hs_ladder = None
            if sharded_device_path:
                _t1 = _time.perf_counter()
                Hs_ladder, n_iter, ladder_exec = solve_nmf_sharded_device(
                    mesh, Xd, chunk_seeds, x_mean, k, pad_k, nmf_kwargs
                )
                W = Ht = None
            elif gspmd_seeded_path:
                _t1 = _time.perf_counter()
                # Xd may carry zero-padded rows for even cell shards;
                # X_host's count scales the regularization exactly
                W, Ht, n_iter = solve_nmf_batch_sharded_seeded(
                    mesh, Xd, chunk_seeds, x_mean, k, pad_k, nmf_kwargs,
                    n_cells=X_host.shape[0],
                )
            elif seeded_single:
                _t1 = _time.perf_counter()
                Hs_ladder, n_iter, ladder_exec = solve_nmf_batch_ladder_seeded(
                    Xd, chunk_seeds, x_mean, k, pad_k, nmf_kwargs
                )
                W = Ht = None
            else:
                W0, Ht0 = self._build_restart_init(
                    X_host, k, chunk_seeds, init, pad_k, device_init, x_mean,
                    dtype,
                )
                _t1 = _time.perf_counter()
            if sharded_device_path or gspmd_seeded_path or seeded_single:
                pass
            elif multi_device:
                # beta != 2 solves run under shard_map over the restart axis
                # so the fused Pallas MU kernels stay usable per shard;
                # frobenius/CD and cell-sharded meshes take the GSPMD path
                W, Ht, n_iter = solve_nmf_batch_sharded(
                    mesh, Xd, W0, Ht0, nmf_kwargs
                )
            else:
                # compaction measured slower than the plain batched solve on
                # current hardware (dispatch overhead > tail savings); opt in
                # via CNMF_TPU_COMPACT=1
                use_compact = (
                    os.environ.get("CNMF_TPU_COMPACT", "0") == "1"
                    and nmf_kwargs.get("solver", "cd") == "cd"
                )
                # on-device ladder compaction: the shrinking-batch schedule
                # runs inside ONE program (no host control reads), so the
                # tail savings survive the relay's dispatch latency —
                # measured 1.66x faster solves at the bench config (real
                # norm_counts, K=13/8/5 x 100). Default ON for the TPU
                # backend; CPU keeps the plain batched solver so the f32
                # factors stay on the sklearn-identical trajectory
                # (re-packing changes matmul batch sizes, which perturbs f32
                # reduction order — see tests/test_device_ladder.py).
                use_dladder = device_ladder_enabled() and not use_compact
                if use_dladder:
                    Hs_ladder, n_iter, ladder_exec = solve_nmf_batch_ladder(
                        Xd, jnp.asarray(W0), jnp.asarray(Ht0), nmf_kwargs
                    )
                    W = Ht = None
                else:
                    ladder_exec = None
                    W, Ht, n_iter = solve_nmf_batch(
                        Xd, jnp.asarray(W0), jnp.asarray(Ht0), nmf_kwargs,
                        compact=use_compact,
                    )
            if trace:
                jax.block_until_ready(n_iter)
            if hasattr(self, "_sweep_counts"):
                # third element (ladder-scheduler runs only): (ladder sizes,
                # per-stage sweep counts) so executed-FLOP accounting reflects
                # the shrinking batch instead of B × max(n_iter)
                entry = (pad_k, n_iter)
                if Hs_ladder is not None:
                    entry = (pad_k, n_iter, ladder_exec)
                self._sweep_counts.append(entry)
            _t2 = _time.perf_counter()
            phases = getattr(self, "_factorize_phases", None)
            if phases is not None:
                with self._phases_lock:
                    phases["init_s"] += _t1 - _t0
                    phases["dispatch_s"] += _t2 - _t1
            # transpose to (B, pad_k, G) ON DEVICE: the fetched buffer is then
            # row-contiguous per spectrum, so every downstream host step
            # (per-iter file writes, the merged stack memo) is a cheap view
            # instead of a strided 65 MB gather (the device-ladder solver
            # already emits fetch layout)
            if Hs_ladder is not None:
                Hs = Hs_ladder
            else:
                Hs = _swap_components_genes(Ht) if isinstance(Ht, jax.Array) \
                    else np.swapaxes(np.asarray(Ht), 1, 2)
            # drop the padded component rows ON DEVICE before any fetch:
            # they are exact zeros (zero-padded init is a no-op for both
            # solvers) that the host drain slices off anyway, and K=5..13
            # on pad buckets 8/16 makes them ~28% of the result bytes —
            # real seconds through the relay's ~9-90 MB/s d→h drain.
            # (slice_k=False callers pack the whole bucket instead: one
            # compile + one transfer per bucket, see factorize())
            if not slice_k and not fetch and chunk >= B:
                out.append(Hs)
                continue
            if isinstance(Hs, jax.Array) and k < Hs.shape[1]:
                Hs = Hs[:, :k, :]
            if isinstance(Hs, jax.Array) and not fetch and chunk >= B:
                try:
                    # start the device→host bytes moving NOW — the transfer
                    # rides the relay while the next K's solve executes
                    Hs.copy_to_host_async()
                except Exception:
                    pass  # sharded arrays may not support async host copies
            if not fetch:
                # in restart-chunked (atlas) mode, sync-fetch per chunk so at
                # most one chunk's buffers are live on device at a time
                out.append(np.asarray(Hs) if chunk < B else Hs)
                continue
            fetched = np.asarray(Hs)[:, :k, :]
            if trace:
                _t3 = _time.perf_counter()
                import sys
                print(
                    f"[cnmf-tpu timing] k={k}: init {_t1-_t0:.2f}s "
                    f"solve {_t2-_t1:.2f}s fetch {_t3-_t2:.2f}s",
                    file=sys.stderr, flush=True,
                )
            out.append(fetched)  # (B, k, G)
        if not fetch:
            return out
        return np.concatenate(out, axis=0)

    def warmup(self, components=None, verbose=True, parallel=4):
        """AOT-compile the run's standard device programs (no execution).

        XLA compiles are the fresh-environment cold-start wall: the remote
        compiler on relayed TPU backends costs seconds per program, and a
        full pipeline pass touches ~15 programs. ``warmup`` lowers and
        compiles every program the prepared run will dispatch — per-bucket
        device init / ladder solve / result pack for factorize, the KNN
        density program, the fused consensus chain and the fused k-stats
        program for every K in the replicate table — so they land in JAX's
        compilation cache (set ``jax_compilation_cache_dir`` to persist
        across processes; the CLI's ``warmup`` subcommand wires
        ``--cache-dir``). Only shapes and static config go in; no data is
        uploaded and nothing executes. The reference has no equivalent
        because sklearn ships precompiled kernels (reference cnmf.py:692
        starts instantly); this is the TPU-native answer.

        Mirrors the runtime dispatch gates (device init, ladder,
        packed-bucket drain, fused consensus/k-stats, Pallas eligibility) —
        tests/test_warmup.py pins "a warmed process compiles nothing new".
        Consensus' post-filter spectra count is assumed unshrunk (the
        512-row pad bucket usually absorbs the density filter's drop); a
        heavy drop recompiles that one program at run time.

        ``parallel``: thread-pool width for the compiles — concurrent
        remote compiles through axon overlap (measured ~2.8x for 3
        threads), so the wall is ~max(program) instead of the sum.

        Returns ``{program_label: compile_seconds}`` (-1.0 = lowering
        failed; a gate mismatch, reported not raised)."""
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        # absorb the one-time device-link setup (and its tiny convert
        # program) here rather than on the warmed run's first fetch
        float(jnp.zeros(()))

        jobs = self._warmup_jobs(components)
        done = {}

        def run_one(job):
            _stage, label, fn, args, kwargs = job
            t0 = _time.perf_counter()
            try:
                fn.lower(*args, **kwargs).compile()
                done[label] = round(_time.perf_counter() - t0, 2)
            except Exception as e:  # gate drift: report, keep warming
                done[label] = -1.0
                if verbose:
                    print(f"warmup: {label} failed to lower: {e}")
            if verbose and done[label] >= 0:
                print(f"warmup: {label} compiled in {done[label]:.2f}s")

        if parallel and parallel > 1:
            with ThreadPoolExecutor(max_workers=int(parallel)) as ex:
                list(ex.map(run_one, jobs))
        else:
            for job in jobs:
                run_one(job)
        return done

    # process-wide: factorize's cold-start auto-warm runs once per job set
    _AUTOWARM_DONE = set()

    def _autowarm(self, norm_shape=None, tpm_meta=None):
        """Cold-start auto-warm (factorize): on the TPU backend with a
        persistent compilation cache configured, AOT-compile this run's own
        factorize programs in PARALLEL before dispatching — the dispatch
        loop otherwise pays each compile back-to-back (the dispatching
        thread blocks on compilation) — and the consensus-stage programs in
        the background so they ride under the solves. No-op when the cache
        dir is unset (the AOT results would be unreachable by the later
        dispatches), on non-TPU backends (local compiles are cheap), or
        after the first run per process (warm runs must not pay AOT cache
        loads). Opt out with CNMF_TPU_AUTOWARM=0."""
        if os.environ.get("CNMF_TPU_AUTOWARM", "1") != "1":
            return
        if jax.default_backend() != "tpu":
            return
        if not jax.config.jax_compilation_cache_dir:
            return
        try:
            jobs = self._warmup_jobs(norm_shape=norm_shape,
                                     tpm_meta=tpm_meta)
        except Exception:
            return  # never fail factorize for a warm cache
        key = tuple(sorted(j[1] for j in jobs))
        if key in cNMF._AUTOWARM_DONE:
            return
        cNMF._AUTOWARM_DONE.add(key)
        from concurrent.futures import ThreadPoolExecutor

        def compile_one(job):
            try:
                job[2].lower(*job[3], **job[4]).compile()
            except Exception:
                pass

        # factorize's own programs ONLY, JOINED — the dispatches right after
        # this hit the compilation cache instead of compiling serially.
        # (Concurrent remote compiles overlap but each slows ~1.5-2x as the
        # compile service is shared; 4 threads still measured a net win for
        # the joined set. A BACKGROUND fleet for the consensus programs was
        # measured a loss twice over: its RPCs contend with the solve
        # dispatches on the shared channel, and a daemon compile thread
        # alive at interpreter teardown aborts the process mid-RPC —
        # consensus keeps compiling its own programs at first dispatch.)
        with ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="cnmf-tpu-autowarm"
        ) as pool:
            list(pool.map(
                compile_one, [j for j in jobs if j[0] == "factorize"]
            ))

    def _autowarm_sweep(self, norm_shape):
        """Cold-start auto-warm for the K-selection sweep: AOT-compile the
        per-K fused stats programs in PARALLEL (joined) before the dispatch
        loop — k_selection_plot otherwise pays each remote compile
        back-to-back, one per K (a fresh-cache 9-K sweep measured >10 min
        serial through axon's 30-90 s/program compiler; concurrent compiles
        overlap ~2.8x, so the joined warm is ~max(program) instead of the
        sum). Same guards as factorize's _autowarm: TPU backend with a
        persistent compilation cache, once per job set per process,
        CNMF_TPU_AUTOWARM=0 opts out. Skips (rather than joins) when the
        TPM h5ad write is still in flight — a same-process pipeline has
        already primed the cache via factorize's autowarm, and joining
        would drag prepare's write onto the sweep's critical path."""
        if os.environ.get("CNMF_TPU_AUTOWARM", "1") != "1":
            return
        if jax.default_backend() != "tpu":
            return
        if not jax.config.jax_compilation_cache_dir:
            return
        if self._write_pending(self.paths["tpm"]):
            return
        try:
            from cnmf_tpu.io.h5ad import read_h5ad_shape, read_h5ad_x_is_sparse

            tpm_meta = (
                read_h5ad_shape(self.paths["tpm"])[1],
                read_h5ad_x_is_sparse(self.paths["tpm"]),
            )
            jobs = [
                j for j in self._warmup_jobs(norm_shape=norm_shape,
                                             tpm_meta=tpm_meta)
                if j[1].startswith("k_stats")
            ]
        except Exception:
            return  # never fail the sweep for a warm cache
        key = tuple(sorted(j[1] for j in jobs))
        if not jobs or key in cNMF._AUTOWARM_DONE:
            return
        cNMF._AUTOWARM_DONE.add(key)
        from concurrent.futures import ThreadPoolExecutor

        def compile_one(job):
            try:
                job[2].lower(*job[3], **job[4]).compile()
            except Exception:
                pass

        with ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="cnmf-tpu-autowarm"
        ) as pool:
            list(pool.map(compile_one, jobs))

    def _warmup_jobs(self, components=None, norm_shape=None, tpm_meta=None):
        """Build the (stage, label, jit_fn, args, kwargs) job list for every
        program the prepared run will dispatch — shared by ``warmup()`` and
        factorize's cold-start auto-warm. Stage 'factorize' must compile
        before the solves dispatch; stage 'consensus' (KNN density, fused
        consensus, fused k-stats, TPM expand) can compile in the background.

        ``norm_shape``/``tpm_meta``: (N, G) and (Gall, tpm_is_sparse)
        overrides so a same-process caller with async prepare writes in
        flight doesn't have to join them just to read shapes."""
        from jax import ShapeDtypeStruct as SDS

        from cnmf_tpu.io.h5ad import read_h5ad_shape, read_h5ad_x_is_sparse
        from cnmf_tpu.ops.distance import _knn_density_padded
        from cnmf_tpu.ops.init import _gen_device_init_jit
        from cnmf_tpu.ops.nmf import (
            _ladder,
            nmf_cd_device_ladder,
            nmf_cd_segment,
            nmf_mu_device_ladder,
            nmf_multiplicative_update,
        )
        from cnmf_tpu.ops.consensus_fused import (
            _fused_consensus,
            _fused_consensus_full,
        )
        from cnmf_tpu.ops.kstats import _fused_k_stats
        from cnmf_tpu.pipeline.solvers import _seeded_ladder

        run_params = load_df_from_npz(self.paths["nmf_replicate_parameters"])
        nmf_kwargs = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )
        if norm_shape is not None:
            N, G = norm_shape
        else:
            self._flush_pending_write(self.paths["normalized_counts"])
            N, G = read_h5ad_shape(self.paths["normalized_counts"])
        if tpm_meta is not None:
            Gall, tpm_sparse = tpm_meta
        else:
            self._flush_pending_write(self.paths["tpm"])
            _, Gall = read_h5ad_shape(self.paths["tpm"])
            tpm_sparse = read_h5ad_x_is_sparse(self.paths["tpm"])
        hvgs = open(self.paths["nmf_genes_list"]).read().split("\n")
        H = len(hvgs)
        dtype = jnp.dtype(self.compute_dtype)
        idt = jnp.dtype(jnp.int32)

        if components is None:
            ks = sorted(set(int(k) for k in run_params.n_components))
        else:
            ks = sorted({int(components)} if np.isscalar(components)
                        else {int(k) for k in components})
        sizes = {
            int(k): len(g)
            for k, g in run_params.groupby("n_components", sort=True)
            if int(k) in ks
        }

        solver = nmf_kwargs.get("solver", "cd")
        beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
        init = nmf_kwargs.get("init", "random")
        tol = float(nmf_kwargs.get("tol", 1e-4))
        max_iter = int(nmf_kwargs.get("max_iter", 200))
        l1_reg_W, l1_reg_H, l2_reg_W, l2_reg_H = compute_regularization(
            float(nmf_kwargs.get("alpha_W", 0.0)),
            nmf_kwargs.get("alpha_H", "same"),
            float(nmf_kwargs.get("l1_ratio", 0.0)),
            (N, G),
        )

        jobs = []
        seen = set()

        def lower(stage, label, fn, *args, **kwargs):
            if label in seen:  # e.g. two Ks sharing one density pad bucket
                return
            seen.add(label)
            jobs.append((stage, label, fn, args, kwargs))

        # ---- same-process compact-upload programs (stash-gated) ----------
        # mirrors factorize's CNMF_TPU_DEVICE_NORM gate and the TPM
        # prefetch's compact branch (_prefetch_tpm_async) — both exist only
        # when prepare ran in THIS process and stashed the integer image
        nstash = getattr(self, "_norm_compact", None)
        _env_dn = os.environ.get("CNMF_TPU_DEVICE_NORM", "")
        norm_derive_on = (
            nstash is not None
            and (_env_dn == "1"
                 or (_env_dn != "0" and jax.default_backend() == "tpu"))
            and nstash[3].dtype == self.compute_dtype
        )
        # factorize fuses the TPM expansion into its input derive when the
        # prefetch would expand the same image (single-device layout) —
        # mirror that gate so the warmed run dispatches the SAME program
        fused_tpm_target, fused_tpm_scale = (
            self._fused_tpm_derive_target() if norm_derive_on
            else (None, None)
        )
        if norm_derive_on:
            from cnmf_tpu.ops.device_tpm import (
                derive_norm_and_tpm,
                norm_from_counts,
            )

            _, n_ints, n_cols, n_std = nstash
            if fused_tpm_target is not None:
                lower(
                    "factorize", "derive_norm_and_tpm", derive_norm_and_tpm,
                    SDS(n_ints.shape, jnp.dtype(n_ints.dtype)),
                    SDS(n_cols.shape, jnp.dtype(n_cols.dtype)),
                    SDS(n_std.shape, dtype),
                    SDS(fused_tpm_scale.shape, dtype),
                )
            else:
                lower(
                    "factorize", "norm_from_counts", norm_from_counts,
                    SDS(n_ints.shape, jnp.dtype(n_ints.dtype)),
                    SDS(n_cols.shape, jnp.dtype(n_cols.dtype)),
                    SDS(n_std.shape, dtype),
                )
            # the CSR-compact upload's device-side scatter (upload_int_image)
            stashed_csr = getattr(self, "_ints_csr", None)
            if stashed_csr is not None and stashed_csr[1] is not None:
                from cnmf_tpu.ops.device_tpm import (
                    _CSR_NNZ_BUCKET,
                    _densify_int_csr,
                )

                c_data, c_cols, c_indptr = stashed_csr[1]
                nnz_p = c_data.shape[0] + (-c_data.shape[0]) % _CSR_NNZ_BUCKET
                lower(
                    "factorize", "densify_int_csr", _densify_int_csr,
                    SDS((nnz_p,), jnp.dtype(c_data.dtype)),
                    SDS((nnz_p,), jnp.dtype(c_cols.dtype)),
                    SDS(c_indptr.shape, jnp.dtype(c_indptr.dtype)),
                    n_rows=int(n_ints.shape[0]), n_cols=int(n_ints.shape[1]),
                )
        tstash = getattr(self, "_tpm_compact", None)
        if (
            tstash is not None
            # the fused factorize derive seeds the device TPM itself — the
            # prefetch short-circuits and tpm_from_counts never dispatches
            and fused_tpm_target is None
            and os.environ.get("CNMF_TPU_PREFETCH_TPM", "1") == "1"
            # the cell-SHARDED mesh variant compiles against sharded inputs
            # whose GSPMD key a plain lowering would not match — warmup
            # covers the single-device-layout runs (1 device or
            # shard_cells=False), mirroring _prefetch_tpm_async
            and not (len(jax.devices()) > 1
                     and getattr(self, "shard_cells", True))
        ):
            from cnmf_tpu.ops.device_tpm import tpm_from_counts

            _, t_ints, t_scale = tstash
            derived = (
                t_ints.shape[0] * t_ints.shape[1]
                * self.compute_dtype.itemsize
            )
            if (
                t_scale.dtype == self.compute_dtype
                and derived < 0.5 * self._tpm_device_limit()
            ):
                lower(
                    "consensus", "tpm_from_counts", tpm_from_counts,
                    SDS(t_ints.shape, jnp.dtype(t_ints.dtype)),
                    SDS(t_scale.shape, dtype),
                )

        # ---- factorize (single-device path; mirrors _factorize_one_k) ----
        buckets = {}
        for k in ks:
            buckets.setdefault(-(-k // 8) * 8, []).append(k)
        device_init = init == "random" and device_init_enabled()
        use_dladder = (
            device_ladder_enabled()
            and os.environ.get("CNMF_TPU_COMPACT", "0") != "1"
        )
        total_padk = sum(pad_k * len(kk) for pad_k, kk in buckets.items())
        pipeline_all = 2 * total_padk * N * dtype.itemsize < 2e9
        Xs = SDS((N, G), dtype)
        for pad_k, kk in sorted(buckets.items()):
            # mirror _factorize_one_k's restart chunking: at atlas scale the
            # runtime splits each K's B restarts into HBM-bounded chunks, so
            # the solver programs lower at the CHUNK sizes (body + tail), not
            # the full per-K count — otherwise the precompile misses and the
            # run pays an on-demand remote compile per bucket
            per_restart = N * pad_k * dtype.itemsize * 4
            rchunk = max(1, int(4e9 / max(per_restart, 1)))

            def _chunk_sizes(B, rchunk=rchunk):
                c = min(rchunk, B)
                out = {c}
                if B % c:
                    out.add(B % c)
                return out

            Bs = sorted({b for k in kk for b in _chunk_sizes(sizes[k])})
            for B in Bs:
                Ws, Hts = SDS((B, N, pad_k), dtype), SDS((B, G, pad_k), dtype)
                if device_init and not use_dladder:
                    lower(
                        "factorize", f"init_pad{pad_k}_B{B}", _gen_device_init_jit(),
                        SDS((B,), jnp.dtype(jnp.uint32)), SDS((), dtype),
                        SDS((pad_k,), dtype),
                        n=N, g=G, pad_k=pad_k, dt=dtype,
                    )
                if use_dladder and device_init:
                    # init + ladder fused into one program
                    # (solvers._seeded_ladder) — mirrors _factorize_one_k's
                    # seeded_single path
                    lower(
                        "factorize", f"seeded_ladder_pad{pad_k}_B{B}",
                        _seeded_ladder,
                        Xs, SDS((B,), jnp.dtype(jnp.uint32)),
                        SDS((), dtype), SDS((pad_k,), dtype),
                        pad_k=pad_k, solver=solver, beta=beta,
                        tol=tol, max_iter=max_iter,
                        ladder=tuple(_ladder(B, 16)),
                        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                        mu_chunk=8,
                        use_pallas=(
                            solver != "cd"
                            and mu_pallas_eligible(beta, dtype, shape=(N, G))
                        ),
                    )
                elif use_dladder and solver == "cd" and beta == 2.0:
                    lower(
                        "factorize", f"cd_ladder_pad{pad_k}_B{B}", nmf_cd_device_ladder,
                        Xs, Ws, Hts, tol=tol, max_iter=max_iter,
                        ladder=tuple(_ladder(B, 16)),
                        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                    )
                elif use_dladder:
                    lower(
                        "factorize", f"mu_ladder_pad{pad_k}_B{B}", nmf_mu_device_ladder,
                        Xs, Ws, Hts, beta=beta, tol=tol, max_iter=max_iter,
                        ladder=tuple(_ladder(B, 16)),
                        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                        chunk=8,
                        use_pallas=mu_pallas_eligible(beta, dtype,
                                                      shape=(N, G)),
                    )
                elif solver == "cd" and beta == 2.0:
                    lower(
                        "factorize", f"cd_segment_pad{pad_k}_B{B}", nmf_cd_segment,
                        Xs, Ws, Hts, SDS((B,), dtype), SDS((B,), idt),
                        SDS((B,), jnp.dtype(bool)), SDS((), idt),
                        seg_len=max_iter, tol=tol, update_H=True,
                        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                        use_pallas=cd_pallas_eligible((N, G), dtype),
                        interpret=False,
                    )
                else:
                    lower(
                        "factorize", f"mu_batch_pad{pad_k}_B{B}", nmf_multiplicative_update,
                        Xs, Ws, Hts, beta=beta, tol=tol, max_iter=max_iter,
                        update_H=True,
                        l1_reg_W=l1_reg_W, l1_reg_H=l1_reg_H,
                        l2_reg_W=l2_reg_W, l2_reg_H=l2_reg_H,
                        chunk=8,
                        use_pallas=mu_pallas_eligible(beta, dtype,
                                                      shape=(N, G)),
                    )
                if not use_dladder:
                    # the non-ladder drain's glue: the eager zero-state
                    # constructors of nmf_coordinate_descent and the
                    # fetch-layout transpose (factorize's
                    # _swap_components_genes) — executed/lowered here so a
                    # warmed non-ladder run compiles nothing either
                    from cnmf_tpu.ops.nmf import _swap_bg_axes

                    jnp.zeros(B, dtype), jnp.zeros(B, jnp.int32)
                    jnp.zeros(B, bool), jnp.zeros((), jnp.int32)
                    lower("factorize", f"swap_bg_pad{pad_k}_B{B}", _swap_bg_axes,
                          SDS((B, G, pad_k), dtype))
            if pipeline_all and os.environ.get(
                    "CNMF_TPU_PACK_ALL", "1") != "1":
                # factorize's pack_ok also admits use_mesh=False on a
                # multi-device host, so lower the pack regardless of
                # device count (sub-second compile)
                lower(
                    "factorize", f"pack_pad{pad_k}", pack_spectra_true_k,
                    tuple(SDS((sizes[k], pad_k, G), dtype) for k in kk),
                    ks=tuple(kk),
                )
        if pipeline_all and os.environ.get("CNMF_TPU_PACK_ALL", "1") == "1":
            # the cross-bucket merged pack: one program over EVERY K's
            # handles in (bucket, k) order — must match factorize's
            # all_handles accumulation exactly
            lower(
                "factorize", "pack_all", pack_spectra_true_k,
                tuple(
                    SDS((sizes[k], pad_k, G), dtype)
                    for pad_k, kk in sorted(buckets.items()) for k in kk
                ),
                ks=tuple(
                    k for _, kk in sorted(buckets.items()) for k in kk
                ),
            )

        # ---- consensus / k-stats per K (mirrors consensus()) ------------
        tpm_on_device = N * Gall * 4 < self._tpm_device_limit()
        use_fused = (
            tpm_on_device
            and os.environ.get("CNMF_TPU_FUSED_CONSENSUS", "1") == "1"
        )
        use_pallas_mu = (
            mu_pallas_eligible(beta, dtype, shape=(N, Gall))
            if solver == "mu" else False
        )
        kstat_pallas = (
            mu_pallas_eligible(beta, dtype, shape=(N, G)) if solver == "mu"
            else cd_pallas_eligible((N, G), dtype)
        )
        full_fused = use_fused and device_kmeanspp_enabled()
        for k in ks:
            R = sizes[k] * k
            Rp = -(-R // 512) * 512
            Kp = -(-k // 8) * 8
            if not full_fused:
                # the full-fused program recomputes density inline — the
                # standalone program never dispatches on that path
                lower(
                    "consensus", f"knn_density_R{Rp}", _knn_density_padded,
                    SDS((Rp, G), dtype), SDS((), idt), SDS((), idt),
                )
            lower(
                "consensus", f"k_stats_k{k}", _fused_k_stats,
                SDS((N, G), dtype), SDS((Rp, G), dtype),
                SDS((10, Kp, G), dtype), SDS((), dtype),
                SDS((), idt), SDS((), idt), SDS((), idt),
                n_cluster_pad=Kp, lloyd_max_iter=300,
                solver=solver, beta=beta, refit_tol=tol,
                refit_max_iter=max_iter, l1_reg_W=l1_reg_W,
                l2_reg_W=l2_reg_W, mu_chunk=8, use_pallas=kstat_pallas,
            )
            if device_spectra_enabled() and device_kmeanspp_enabled():
                # twin-fed sweep variant: raw (R, G) spectra in, L2 + pad +
                # threefry kmeans++ seeding in-program (ops/kstats.py
                # _fused_k_stats_dev)
                from cnmf_tpu.ops.kstats import _fused_k_stats_dev

                lower(
                    "consensus", f"k_stats_dev_k{k}", _fused_k_stats_dev,
                    SDS((N, G), dtype), SDS((R, G), dtype),
                    SDS((2,), jnp.dtype(jnp.uint32)),
                    SDS((), idt), SDS((), idt),
                    r_pad=Rp, n_cluster_pad=Kp, n_init=10,
                    n_local_trials=2 + int(np.log(k)),
                    lloyd_max_iter=300, lloyd_tol=1e-4,
                    solver=solver, beta=beta, refit_tol=tol,
                    refit_max_iter=max_iter, l1_reg_W=l1_reg_W,
                    l2_reg_W=l2_reg_W, mu_chunk=8, use_pallas=kstat_pallas,
                )
            if full_fused:
                # density + filter + device kmeans++ + chain as ONE program
                # (consensus()'s full_fused branch)
                lower(
                    "consensus", f"fused_consensus_full_k{k}",
                    _fused_consensus_full,
                    SDS((N, G), dtype), SDS((N, Gall), dtype),
                    SDS((Rp, G), dtype), SDS((Rp,), dtype),
                    SDS((), jnp.dtype(bool)), SDS((), dtype),
                    SDS((), idt), SDS((), idt),
                    SDS((2,), jnp.dtype(jnp.uint32)),
                    SDS((), dtype), SDS((), idt),
                    SDS((Gall,), dtype), SDS((H,), idt),
                    n_cluster_pad=Kp, n_init=10,
                    n_local_trials=2 + int(np.log(k)), lloyd_max_iter=300,
                    solver=solver, beta=beta, tol=tol, max_iter=max_iter,
                    mu_chunk=8, use_pallas=use_pallas_mu,
                    n_cells=N, n_hvgs=H,
                    alpha_W=float(nmf_kwargs.get("alpha_W", 0.0)),
                    l1_ratio=float(nmf_kwargs.get("l1_ratio", 0.0)),
                    refit_usage=True, normalize_tpm=False,
                    zero_safe_std=tpm_sparse,
                )
                if device_spectra_enabled():
                    # the same-process pipeline feeds the RAW (R, G) packed
                    # device spectra instead of the host-padded upload
                    # (CNMF_TPU_DEVICE_SPECTRA): its program normalizes and
                    # pads in-trace, so the shapes (and statics) differ
                    lower(
                        "consensus", f"fused_consensus_full_dev_k{k}",
                        _fused_consensus_full,
                        SDS((N, G), dtype), SDS((N, Gall), dtype),
                        SDS((R, G), dtype), SDS((Rp,), dtype),
                        SDS((), jnp.dtype(bool)), SDS((), dtype),
                        SDS((), idt), SDS((), idt),
                        SDS((2,), jnp.dtype(jnp.uint32)),
                        SDS((), dtype), SDS((), idt),
                        SDS((Gall,), dtype), SDS((H,), idt),
                        n_cluster_pad=Kp, n_init=10,
                        n_local_trials=2 + int(np.log(k)), lloyd_max_iter=300,
                        solver=solver, beta=beta, tol=tol, max_iter=max_iter,
                        mu_chunk=8, use_pallas=use_pallas_mu,
                        n_cells=N, n_hvgs=H,
                        alpha_W=float(nmf_kwargs.get("alpha_W", 0.0)),
                        l1_ratio=float(nmf_kwargs.get("l1_ratio", 0.0)),
                        refit_usage=True, normalize_tpm=False,
                        zero_safe_std=tpm_sparse,
                        normalize_rows=True, r_pad=Rp,
                    )
            elif use_fused:
                lower(
                    "consensus", f"fused_consensus_k{k}", _fused_consensus,
                    SDS((N, G), dtype), SDS((N, Gall), dtype),
                    SDS((Rp, G), dtype), SDS((10, Kp, G), dtype),
                    SDS((), dtype), SDS((), idt), SDS((), idt),
                    SDS((Gall,), dtype), SDS((H,), idt),
                    n_cluster_pad=Kp, lloyd_max_iter=300,
                    solver=solver, beta=beta, tol=tol, max_iter=max_iter,
                    mu_chunk=8, use_pallas=use_pallas_mu,
                    n_cells=N, n_hvgs=H,
                    alpha_W=float(nmf_kwargs.get("alpha_W", 0.0)),
                    l1_ratio=float(nmf_kwargs.get("l1_ratio", 0.0)),
                    refit_usage=True, normalize_tpm=False,
                    zero_safe_std=tpm_sparse,
                )
        return jobs

    def factorize_multi_process(self, total_workers=None):
        """Compat shim: the batched device program replaces the reference's
        multiprocessing pool (cnmf.py:677-689); one call does all the work."""
        if total_workers is not None and total_workers != 1:
            print(
                "factorize_multi_process: total_workers=%s ignored — the "
                "batched device program already runs every restart in one "
                "dispatch (no process pool needed)." % total_workers
            )
        self.factorize(worker_i=0, total_workers=1)

    def _nmf(self, X, nmf_kwargs):
        """Single NMF solve mirroring sklearn's return convention
        (spectra, usages) — kept for API compatibility (cnmf.py:661-674)."""
        from cnmf_tpu.ops.init import random_init

        if sp.issparse(X):
            X = np.asarray(X.todense())
        X = np.ascontiguousarray(X, dtype=self.compute_dtype)
        kwargs = dict(nmf_kwargs)
        H = kwargs.pop("H", None)
        update_H = kwargs.pop("update_H", True)
        if not update_H:
            usages = refit_usages(X, np.asarray(H), kwargs, dtype=self.compute_dtype)
            return np.asarray(H), usages
        k = int(kwargs.pop("n_components"))
        seed = kwargs.pop("random_state", None)
        init = kwargs.get("init", "random")
        if init == "random":
            W0, H0 = random_init(X, k, seed, dtype=self.compute_dtype)
        else:
            W0, H0 = nndsvd_init(X, k, dtype=self.compute_dtype,
                                 variant=init, seed=seed)
        W, Ht, _ = solve_nmf_batch(
            jnp.asarray(X), jnp.asarray(W0[None]),
            jnp.asarray(np.ascontiguousarray(H0.T)[None]), kwargs,
        )
        return np.asarray(Ht[0]).T, np.asarray(W[0])

    # ==================================================================
    # combine
    # ==================================================================

    @timed("combine")
    def combine(self, components=None, skip_missing_files=False):
        from concurrent.futures import ThreadPoolExecutor

        run_params = load_df_from_npz(self.paths["nmf_replicate_parameters"])
        if type(components) is int:
            ks = [components]
        elif components is None:
            ks = sorted(set(run_params.n_components))
        else:
            ks = components
        # K values are independent (disjoint input/output files); the work is
        # memo recalls + npz IO, which threads overlap well
        with ThreadPoolExecutor(max_workers=min(8, max(len(ks), 1))) as pool:
            list(pool.map(
                lambda k: self.combine_nmf(
                    k, skip_missing_files=skip_missing_files,
                    _run_params=run_params,
                    # the fan-out discards per-K frames, so the merge may
                    # ride the writer behind a still-in-flight packed drain
                    _defer=True,
                ),
                ks,
            ))

    def combine_nmf(self, k, skip_missing_files=False,
                    remove_individual_iterations=False, _run_params=None,
                    _defer=False):
        """Concatenate per-iteration spectra into the merged (n_iter·K × G)
        stack with ``iter{r}_topic{t}`` row labels (reference cnmf.py:748-773).
        ``_run_params``: pre-loaded replicate table (combine() hoists the load
        out of its per-K fan-out). ``_defer`` (internal, combine()'s loop
        under CNMF_TPU_ASYNC_WRITES=1): when factorize's packed drain is
        still in flight, queue the merge itself on the background writer and
        return None instead of blocking on the device→host transfer — a
        same-process consensus runs from the registered metadata + device
        twin, and everything joins at flush_writes()."""
        import errno

        from concurrent.futures import ThreadPoolExecutor

        run_params = (
            _run_params if _run_params is not None
            else load_df_from_npz(self.paths["nmf_replicate_parameters"])
        )
        print("Combining factorizations for k=%d." % k)
        run_params_subset = run_params[run_params.n_components == k].sort_values("iter")

        files = []
        for _, p in run_params_subset.iterrows():
            current_file = self.paths["iter_spectra"] % (p["n_components"], p["iter"])
            # a pending background write of our own (CNMF_TPU_ASYNC_WRITES)
            # counts as existing: the stack memo serves its content, and the
            # file-read fallback joins the write first
            if not os.path.exists(current_file) and not self._write_pending(
                current_file
            ):
                if not skip_missing_files:
                    print(
                        "Missing file: %s, run with skip_missing=True to override"
                        % current_file
                    )
                    raise FileNotFoundError(
                        errno.ENOENT, os.strerror(errno.ENOENT), current_file
                    )
                print("Missing file: %s. Skipping." % current_file)
            else:
                files.append((int(p["iter"]), current_file))

        if len(files) == 0:
            print("No spectra found for k=%d" % k)
            return []

        # fast path: a same-process factorize left this K's whole restart
        # batch as one array — one reshape instead of reading/recalling
        # every per-iteration frame (each file's stat is still validated)
        defer = (
            _defer
            and not remove_individual_iterations
            and os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1"
        )
        stack = self._recall_spectra_stack(k, files, join=not defer)
        if os.environ.get("CNMF_TPU_TIMINGS", "0") == "1":
            import sys
            print(f"[cnmf-tpu timing] combine k={k}: stack memo "
                  f"{'hit' if stack is not None else 'MISS'}",
                  file=sys.stderr, flush=True)
        if stack is not None:
            values, columns, dev_twin = stack
            if isinstance(values, _PendingBatch):
                # deferred packed drain still in flight: queue the merge on
                # the writer (FIFO — it runs after the drain task that fills
                # the placeholder), register the metadata a same-process
                # consensus needs, and return without joining the transfer
                return self._defer_merged_write(
                    k, values, columns, files, dev_twin
                )
        else:
            dev_twin = None
            def read_one(f):
                # read-only consumer: values are concatenated immediately
                hit = self._recall_artifact(f[1], copy=False)
                if hit is not None:
                    return hit
                # an async factorize write may still be in flight — join it
                self._flush_pending_write(f[1])
                return load_df_from_npz(f[1])

            with ThreadPoolExecutor(max_workers=8) as pool:
                frames = list(pool.map(read_one, files))
            values = np.concatenate([f.values for f in frames], axis=0)
            columns = frames[0].columns
        index = [
            "iter%d_topic%d" % (it, t + 1) for (it, _) in files for t in range(k)
        ]
        # copy=False: `values` is freshly built either way and only escapes
        # through this frame (the memo below stores its own copy)
        combined_spectra = pd.DataFrame(values, index=index, columns=columns,
                                        copy=False)
        merged_path = self.paths["merged_spectra"] % k
        # memoize a copy-on-write slice: the live frame escapes to the caller
        # below, and a caller mutating it must not corrupt what consensus /
        # k_selection_plot later recall. Under pandas CoW the [:] slice
        # shares data until either side writes (and .values is read-only),
        # so this is a deep copy's safety at a view's cost.
        memo_frame = combined_spectra[:]
        if os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1":
            # the merged npz (the writeback-bound bulk of combine wall)
            # rides the background writer and overlaps consensus's device
            # programs; the memo entry carries the PENDING sentinel so
            # in-process readers use the object without stat validation,
            # and the fallback file loads join the write first
            stored = self._memo_artifact(
                merged_path, memo_frame, values.nbytes,
                stat=self._PENDING_STAT,
            )

            def write_merged():
                st = save_df_to_npz(combined_spectra, merged_path)
                with _MEMO_LOCK:
                    memo = getattr(self, "_artifact_memo", None)
                    entry = memo.get(merged_path) if memo else None
                    if entry is not None and entry[2] is memo_frame:
                        memo[merged_path] = (st[0], st[1], memo_frame,
                                             entry[3])

            if stored:
                self._submit_pending_write(merged_path, write_merged)
            else:
                # memo declined (byte cap): readers would hit the FILE, so
                # the write must be durable before this returns
                save_df_to_npz(combined_spectra, merged_path)
        else:
            st = save_df_to_npz(combined_spectra, merged_path)
            stored = self._memo_artifact(
                merged_path, memo_frame, values.nbytes, stat=st
            )
        if dev_twin is not None and stored:
            # register the device twin against the EXACT memoized frame: a
            # same-process consensus whose merged recall returns this object
            # may consume the device-resident packed spectra instead of
            # re-uploading (CNMF_TPU_DEVICE_SPECTRA). weakref: the twin must
            # not outlive the memo entry it describes.
            import weakref

            with _MEMO_LOCK:
                twins = getattr(self, "_merged_dev", None)
                if twins is None:
                    twins = self._merged_dev = {}
                twins[merged_path] = (weakref.ref(memo_frame), dev_twin)
        if remove_individual_iterations:
            # the reference accepts this kwarg without acting on it
            # (cnmf.py:748); here it actually deletes the per-iteration files
            for _, f in files:
                # join any in-flight background write first — removing a
                # path whose write is queued would let the writer re-create
                # the file after the delete
                self._flush_pending_write(f)
                os.remove(f)
        return combined_spectra

    # ==================================================================
    # refits
    # ==================================================================

    def refit_usage(self, X, spectra):
        """Fixed-spectra NNLS usage refit (reference cnmf.py:776-802)."""
        refit_nmf_kwargs = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )
        spectra_values = spectra.values if isinstance(spectra, pd.DataFrame) else spectra
        X_values = X.values if isinstance(X, pd.DataFrame) else X
        if sp.issparse(X_values):
            X_values = np.asarray(X_values.todense())
        rf_usages = refit_usages(
            np.asarray(X_values), np.asarray(spectra_values),
            refit_nmf_kwargs, dtype=self.compute_dtype,
        )
        if isinstance(X, pd.DataFrame) and isinstance(spectra, pd.DataFrame):
            rf_usages = pd.DataFrame(rf_usages, index=X.index, columns=spectra.index)
        return rf_usages

    def refit_spectra(self, X, usage):
        """Fixed-usage NNLS via the transpose trick (reference cnmf.py:805-820)."""
        if isinstance(X, pd.DataFrame):
            return self.refit_usage(X.T, usage.T).T
        if sp.issparse(X):
            Xt = X.T
        else:
            Xt = np.asarray(X).T
        usage_t = usage.values.T if isinstance(usage, pd.DataFrame) else np.asarray(usage).T
        return self.refit_usage(Xt, usage_t).T

    # ==================================================================
    # consensus
    # ==================================================================

    @timed("consensus")
    def consensus(
        self,
        k,
        density_threshold=DEFAULT_DENSITY_THRESHOLD,
        local_neighborhood_size=0.30,
        show_clustering=True,
        build_ref=True,
        skip_density_and_return_after_stats=False,
        close_clustergram_fig=False,
        refit_usage=True,
        normalize_tpm_spectra=False,
        norm_counts=None,
    ):
        """Consensus spectra/usages via density filtering + KMeans + medians
        (reference cnmf.py:823-1082), with the distance matrix, KNN density,
        KMeans, silhouette, NNLS refits and z-score OLS on device."""
        import time as _time

        _trace = os.environ.get("CNMF_TPU_TIMINGS", "0") == "1"
        _marks = [("start", _time.perf_counter())]

        def _mark(label):
            if _trace:
                _marks.append((label, _time.perf_counter()))

        merged_path = self.paths["merged_spectra"] % k
        merged_spectra = self._recall_artifact(merged_path, copy=False)
        merged_meta = None
        if merged_spectra is None:
            # a deferred merge (combine under a still-in-flight packed
            # drain, CNMF_TPU_ASYNC_WRITES=1) registers the index/columns
            # and the device spectra twin — enough to run the full-fused
            # consensus without joining the device→host transfer
            merged_meta = self._deferred_merged_meta(merged_path)
        if merged_spectra is None and merged_meta is None:
            # an async combine write may still be in flight — join it
            self._flush_pending_write(merged_path)
            merged_spectra = load_df_from_npz(merged_path)
        if merged_spectra is not None:
            spectra_index = merged_spectra.index
            spectra_columns = merged_spectra.columns
        else:
            spectra_index, spectra_columns = merged_meta[0], merged_meta[1]
        if norm_counts is None:
            norm_counts = self._read_h5ad_cached(self.paths["normalized_counts"])

        density_threshold_str = str(density_threshold)
        if skip_density_and_return_after_stats:
            density_threshold_str = "2"
        density_threshold_repl = density_threshold_str.replace(".", "_")
        n_neighbors = int(local_neighborhood_size * len(spectra_index) / k)

        l2_spectra = None

        def _l2():
            # host L2-normalized spectra view — every values-consuming path
            # funnels here; a deferred merge materializes first (joins the
            # in-flight drain + merge on the writer)
            nonlocal merged_spectra, l2_spectra
            if l2_spectra is None:
                if merged_spectra is None:
                    self._flush_pending_write(merged_path)
                    merged_spectra = self._recall_artifact(
                        merged_path, copy=False
                    )
                    if merged_spectra is None:
                        merged_spectra = load_df_from_npz(merged_path)
                # L2-normalize spectra rows
                norms = np.sqrt((merged_spectra.values ** 2).sum(axis=1))
                l2_spectra = pd.DataFrame(
                    merged_spectra.values / norms[:, None],
                    index=merged_spectra.index,
                    columns=merged_spectra.columns,
                )
            return l2_spectra

        if merged_spectra is not None:
            _l2()

        nmf_kwargs = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )

        to_device = self._to_device_dense

        if skip_density_and_return_after_stats:
            # fused stats program: Lloyd → medians → NNLS → silhouette → SSE
            # in ONE device dispatch (see ops/kstats.py); density filtering is
            # skipped on this path (reference cnmf.py:922-936). A same-process
            # factorize's device spectra twin replaces the host upload when
            # the knobs apply (CNMF_TPU_DEVICE_SPECTRA × DEVICE_KMEANSPP).
            spectra_in, _ = self._k_stats_spectra_input(k)
            sil_dev, sse_dev = self._dispatch_k_stats(
                k, spectra_in, nmf_kwargs, norm_counts
            )
            stats_row = pd.DataFrame(
                [k, density_threshold, float(sil_dev), float(sse_dev)],
                index=K_STATS_FIELDS, columns=["stats"],
            )
            # the device scalars are fetched — open any gate-held drain so
            # queued artifact writes don't stall until the hold timeout.
            # (k_selection_plot doesn't route through here — it dispatches
            # the whole sweep itself and releases once at its end.)
            self._release_drains()
            return stats_row

        if os.path.isfile(self.paths["local_density_cache"] % k):
            local_density = load_df_from_npz(self.paths["local_density_cache"] % k)
        else:
            local_density = None

        # the WHOLE consensus — density, filter, kmeans++ seeding, chain —
        # can run as ONE device program (ops/consensus_fused
        # .fused_consensus_full): the host kmeans++ previously forced a
        # device→host→device sync mid-consensus plus its own cold compile.
        # Defer the density compute/filter to that program when it applies;
        # the fused gate itself (tpm_on_device) resolves below.
        full_fused_wanted = (
            os.environ.get("CNMF_TPU_FUSED_CONSENSUS", "1") == "1"
            and device_kmeanspp_enabled()
        )

        def _host_density_filter():
            nonlocal local_density, l2_spectra
            l2 = _l2()
            if local_density is None:
                density = local_density_from_spectra(
                    l2.values.astype(self.compute_dtype), n_neighbors,
                ).astype(np.float64)
                local_density = pd.DataFrame(
                    density, columns=["local_density"], index=l2.index
                )
                save_df_to_npz(
                    local_density, self.paths["local_density_cache"] % k
                )
            filt = local_density.iloc[:, 0] < density_threshold
            l2_spectra = l2.loc[filt, :]
            if l2_spectra.shape[0] == 0:
                raise RuntimeError(
                    "Zero components remain after density filtering. "
                    "Consider increasing density threshold"
                )
            return filt

        if not full_fused_wanted:
            density_filter = _host_density_filter()
            _mark("density")

        # --------------------------------------------------------------
        # shared inputs for both consensus execution paths
        # --------------------------------------------------------------
        # a factorize-launched TPM prefetch may still be uploading; wait for
        # it rather than racing it to the device cache
        self._join_tpm_prefetch()
        tpm = self._read_h5ad_cached(self.paths["tpm"])
        tpm_stats = load_df_from_npz(self.paths["tpm_stats"])
        # the full-gene TPM goes to device once and is reused by the spectra
        # refit, the OLS and the final refit (at atlas scale fall back to
        # the chunked host path)
        tpm_on_device = (
            tpm.X.shape[0] * tpm.X.shape[1] * 4 < self._tpm_device_limit()
        )
        n_cells = norm_counts.X.shape[0]
        hvgs = open(self.paths["nmf_genes_list"]).read().split("\n")
        hvg_idx = tpm.var.index.get_indexer(hvgs)
        if (hvg_idx < 0).any():
            # a -1 would silently gather the LAST gene column in the fused
            # device path; fail like the unfused `.loc` path does
            missing = [h for h, i in zip(hvgs, hvg_idx) if i < 0][:5]
            raise KeyError(
                f"genes from {self.paths['nmf_genes_list']} missing from the "
                f"TPM var index (stale gene list / re-prepared TPM?): {missing}"
            )
        # the reference's sparse path guards zero stds (scanpy pp.scale),
        # its dense path divides unguarded — preserve per input kind
        zero_safe = sp.issparse(tpm.X)

        use_fused = (
            tpm_on_device
            and os.environ.get("CNMF_TPU_FUSED_CONSENSUS", "1") == "1"
        )
        full_fused = full_fused_wanted and use_fused
        if full_fused_wanted and not use_fused:
            # atlas fallback: the TPM exceeds the device budget, so the
            # classic host density/filter runs now and the step-by-step
            # path below takes over
            density_filter = _host_density_filter()
            _mark("density")
        if use_fused:
            # ONE device program from Lloyd to the final refit
            # (ops/consensus_fused.py): the unfused path below pays a
            # host-device synchronization between each of ~6 phases, which
            # dominates consensus wall time on a relayed TPU
            from cnmf_tpu.ops.consensus_fused import (
                fused_consensus,
                fused_consensus_full,
            )

            norm_counts_dev = self._device_cached(
                "_norm_counts_dev_cache", norm_counts,
                lambda: to_device(norm_counts.X),
            )
            tpm_src = self._device_cached(
                "_tpm_dev_cache", tpm, lambda: to_device(tpm.X)
            )
            beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
            solver = nmf_kwargs.get("solver", "cd")
            common = dict(
                tpm_std=tpm_stats["__std"].values,
                hvg_idx=hvg_idx, n_cells=n_cells,
                solver=solver, beta=beta,
                tol=float(nmf_kwargs.get("tol", 1e-4)),
                max_iter=int(nmf_kwargs.get("max_iter", 200)),
                alpha_W=float(nmf_kwargs.get("alpha_W", 0.0)),
                l1_ratio=float(nmf_kwargs.get("l1_ratio", 0.0)),
                use_pallas=(
                    mu_pallas_eligible(beta, self.compute_dtype,
                                       shape=tpm.X.shape)
                    if solver == "mu" else False
                ),
                refit_usage=refit_usage,
                normalize_tpm=normalize_tpm_spectra,
                zero_safe_std=zero_safe,
            )
            if full_fused:
                # density + filter + device kmeans++ fold INTO the program:
                # no mid-consensus host sync, one less cold compile; cached
                # density values win bitwise when the memo file exists.
                # A same-process factorize's packed device spectra stand in
                # for the host upload when the twin validates
                # (CNMF_TPU_DEVICE_SPECTRA — L2 normalization runs
                # in-program; ~1e-7 relative vs the host norms on f32).
                # Under a deferred merge the twin arrives via _merged_meta
                # instead; a missing/declined twin materializes the host
                # values (joining the drain).
                spectra_in = None
                if merged_meta is not None and merged_spectra is None:
                    dev_twin = merged_meta[3]
                    if dev_twin is not None and device_spectra_enabled():
                        packed_, off_, rows_ = dev_twin
                        try:
                            spectra_in = packed_[off_:off_ + rows_]
                        except Exception:
                            spectra_in = None
                if spectra_in is None:
                    spectra_in = self._device_spectra_twin(k, merged_spectra)
                if spectra_in is None:
                    spectra_in = _l2().values.astype(self.compute_dtype)
                (density_np, labels, median_np, rf_init, rf_final,
                 spectra_tpm_np, coef_np) = fused_consensus_full(
                    norm_counts_dev, tpm_src,
                    spectra_in, k,
                    density_threshold=float(density_threshold),
                    n_neighbors=n_neighbors,
                    cached_density=(
                        local_density.values if local_density is not None
                        else None
                    ),
                    **common,
                )
                if local_density is None:
                    local_density = pd.DataFrame(
                        density_np, columns=["local_density"],
                        index=spectra_index,
                    )
                    save_df_to_npz(
                        local_density, self.paths["local_density_cache"] % k
                    )
                density_filter = local_density.iloc[:, 0] < density_threshold
                kept_index = spectra_index[np.asarray(density_filter.values)]
                if l2_spectra is not None:
                    l2_spectra = l2_spectra.loc[density_filter, :]
                _mark("density")
            else:
                # this branch runs after _host_density_filter(), so
                # l2_spectra is the materialized FILTERED frame (the host
                # kmeans++ seeding inside fused_consensus needs host values)
                labels, median_np, rf_init, rf_final, spectra_tpm_np, \
                    coef_np = fused_consensus(
                        norm_counts_dev, tpm_src,
                        l2_spectra.values.astype(self.compute_dtype), k,
                        **common,
                    )
                kept_index = l2_spectra.index
            kmeans_cluster_labels = pd.Series(labels + 1, index=kept_index)
            gep_ids = np.arange(1, k + 1)
            median_spectra = pd.DataFrame(
                median_np, index=gep_ids, columns=spectra_columns
            )
            rf_usages = pd.DataFrame(
                rf_final if refit_usage else rf_init,
                index=norm_counts.obs.index, columns=gep_ids,
            )
            spectra_tpm = pd.DataFrame(
                spectra_tpm_np, index=gep_ids, columns=tpm.var.index
            )
            usage_coef = pd.DataFrame(
                coef_np, index=gep_ids, columns=tpm.var.index
            )
            _mark("fused_consensus")
        else:
            # KMeans on device (10 restarts batched; reference cnmf.py:908-910)
            labels, _, _ = kmeans_fit(
                l2_spectra.values.astype(self.compute_dtype), n_clusters=k,
                n_init=10, random_state=1,
            )
            kmeans_cluster_labels = pd.Series(labels + 1, index=l2_spectra.index)
            _mark("kmeans")

            # per-cluster median spectra, renormalized to row-sum 1
            median_spectra = l2_spectra.groupby(kmeans_cluster_labels).median()
            median_spectra = (median_spectra.T / median_spectra.sum(axis=1)).T

            # one device copy of norm counts, shared by the refits — and cached
            # across repeated consensus calls on the same preloaded object
            # (reference cnmf.py:1124-1130)
            _mark("medians")
            norm_counts_dev = self._device_cached(
                "_norm_counts_dev_cache", norm_counts,
                lambda: to_device(norm_counts.X),
            )
            rf_usages = refit_usages(
                norm_counts_dev, median_spectra.values, nmf_kwargs,
                dtype=self.compute_dtype, n_rows=n_cells,
            )
            rf_usages = pd.DataFrame(
                rf_usages, index=norm_counts.obs.index, columns=median_spectra.index,
            )

            _mark("refit_usages")
            # Re-order usage by total contribution (reference cnmf.py:938-946)
            norm_usages = rf_usages.div(rf_usages.sum(axis=1), axis=0)
            reorder = norm_usages.sum(axis=0).sort_values(ascending=False)
            rf_usages = rf_usages.loc[:, reorder.index]
            norm_usages = norm_usages.loc[:, reorder.index]
            median_spectra = median_spectra.loc[reorder.index, :]
            rf_usages.columns = np.arange(1, rf_usages.shape[1] + 1)
            norm_usages.columns = rf_usages.columns
            median_spectra.index = rf_usages.columns

            if tpm_on_device:
                tpm_src = self._device_cached(
                    "_tpm_dev_cache", tpm, lambda: to_device(tpm.X)
                )
            else:
                tpm_src = tpm.X

            _mark("tpm_upload")
            if tpm_on_device or (
                sp.issparse(tpm.X) and nmf_kwargs.get("solver", "cd") == "cd"
            ):
                # device-resident TPM, or sparse host TPM with the CD
                # solver: either way the refit reduces to the usage gram +
                # one XᵀU product (device matmul / host SpMM) and no
                # (genes × cells) copy ever exists
                spectra_tpm_vals = refit_spectra_transposed(
                    tpm_src, norm_usages.values.astype(self.compute_dtype),
                    nmf_kwargs, dtype=self.compute_dtype, n_cells=n_cells,
                ).T
            else:
                # atlas fallback: the fixed-usage NNLS decomposes per gene, so
                # solve in gene chunks (only a chunk × N tile densifies at a
                # time). Deviation from the joint reference solve: the relative
                # convergence tolerance applies per chunk rather than globally —
                # each chunk still converges to the same NNLS optimum.
                usage_t = np.ascontiguousarray(
                    norm_usages.values.T, dtype=self.compute_dtype
                )
                g_total = tpm.X.shape[1]
                gene_chunk = max(1, int(2e9 / max(tpm.X.shape[0] * 4, 1)))
                parts = []
                tpm_csc = tpm.X.tocsc() if sp.issparse(tpm.X) else tpm.X
                for gstart in range(0, g_total, gene_chunk):
                    gend = min(gstart + gene_chunk, g_total)
                    block = tpm_csc[:, gstart:gend]
                    block = block.toarray() if sp.issparse(block) else np.asarray(block)
                    parts.append(
                        refit_usages(
                            np.ascontiguousarray(block.T, dtype=self.compute_dtype),
                            usage_t, nmf_kwargs, dtype=self.compute_dtype,
                        )
                    )
                spectra_tpm_vals = np.concatenate(parts, axis=0).T
            _mark("refit_spectra_tpm")
            spectra_tpm = pd.DataFrame(
                spectra_tpm_vals, index=rf_usages.columns, columns=tpm.var.index
            )
            if normalize_tpm_spectra:
                spectra_tpm = spectra_tpm.div(spectra_tpm.sum(axis=1), axis=0) * 1e6

            # Z-score spectra: OLS of z-scored TPM on usages (reference cnmf.py:957-959)
            usage_coef = efficient_ols_all_cols(
                rf_usages.values, tpm_src, normalize_y=True, dtype=self.compute_dtype
            )
            _mark("ols")
            usage_coef = pd.DataFrame(
                usage_coef, index=rf_usages.columns, columns=tpm.var.index
            )

            if refit_usage:
                # final usage refit on std-scaled HVG TPM (reference cnmf.py:961-975)
                if tpm_on_device:
                    tpm_hvg = tpm_src[:, jnp.asarray(hvg_idx)]
                    # one-pass moments dividing by the REAL cell count — tpm_src
                    # may carry zero-padded rows (even mesh sharding), which add
                    # nothing to either column sum
                    n = n_cells
                    mean = jnp.sum(tpm_hvg, axis=0) / n
                    sq = jnp.sum(tpm_hvg * tpm_hvg, axis=0) / n
                    var = (sq - mean * mean) * n / (n - 1)
                    std = jnp.sqrt(jnp.maximum(var, 0.0))
                    if zero_safe:
                        std = jnp.where(std == 0, 1.0, std)
                    norm_tpm_X = tpm_hvg / std
                else:
                    norm_tpm_X = tpm[:, hvgs].X
                    if zero_safe:
                        norm_tpm_X = scale_unit_variance(norm_tpm_X, ddof=1, zero_safe=True)
                    else:
                        norm_tpm_X = scale_unit_variance(
                            np.asarray(norm_tpm_X, dtype=np.float64), ddof=1,
                            zero_safe=False,
                        )
                spectra_tpm_rf = spectra_tpm.loc[:, hvgs]
                tpm_stats_idx = tpm_stats.copy()
                tpm_stats_idx.index = tpm.var.index
                spectra_tpm_rf = spectra_tpm_rf.div(tpm_stats_idx.loc[hvgs, "__std"], axis=1)
                # refit_usages handles sparse host matrices directly (CD →
                # host SpMM products; MU → host densify), so the atlas path
                # never expands the HVG TPM slice here
                rf_usages = refit_usages(
                    norm_tpm_X if (tpm_on_device or sp.issparse(norm_tpm_X))
                    else np.asarray(norm_tpm_X),
                    spectra_tpm_rf.values.astype(self.compute_dtype),
                    nmf_kwargs, dtype=self.compute_dtype,
                    n_rows=n_cells if tpm_on_device else None,
                )
                rf_usages = pd.DataFrame(
                    rf_usages, index=norm_counts.obs.index,
                    columns=spectra_tpm_rf.index,
                )

        _mark("final_refit")
        # the eight result files are independent — write them concurrently
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            (save_df_to_npz, median_spectra,
             self.paths["consensus_spectra"] % (k, density_threshold_repl)),
            (save_df_to_npz, rf_usages,
             self.paths["consensus_usages"] % (k, density_threshold_repl)),
            (save_df_to_text, median_spectra,
             self.paths["consensus_spectra__txt"] % (k, density_threshold_repl)),
            (save_df_to_text, rf_usages,
             self.paths["consensus_usages__txt"] % (k, density_threshold_repl)),
            (save_df_to_npz, spectra_tpm,
             self.paths["gene_spectra_tpm"] % (k, density_threshold_repl)),
            (save_df_to_text, spectra_tpm,
             self.paths["gene_spectra_tpm__txt"] % (k, density_threshold_repl)),
            (save_df_to_npz, usage_coef,
             self.paths["gene_spectra_score"] % (k, density_threshold_repl)),
            (save_df_to_text, usage_coef,
             self.paths["gene_spectra_score__txt"] % (k, density_threshold_repl)),
        ]
        if os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1":
            # the eight result files ride the background writer (one thread,
            # submission order) and overlap whatever runs next — their npz
            # compression + txt rendering is a real share of consensus wall
            # on this 1-vCPU host. npz frames are memoized (PENDING sentinel)
            # so in-process readers skip the file; a memo-declined npz write
            # stays synchronous (readers would hit the file). txt consumers
            # (load_results, build_reference) flush-on-read. build_reference
            # queues BEHIND these below, so its txt read-back is durable.
            for fn, frame, path in writes:
                if fn is save_df_to_npz:
                    stored = self._memo_artifact(
                        path, frame, frame.values.nbytes,
                        stat=self._PENDING_STAT,
                    )
                    if not stored:
                        fn(frame, path)
                        continue

                    def write_npz(frame=frame, path=path):
                        st = save_df_to_npz(frame, path)
                        with _MEMO_LOCK:
                            memo = getattr(self, "_artifact_memo", None)
                            entry = memo.get(path) if memo else None
                            if entry is not None and entry[2] is frame:
                                memo[path] = (st[0], st[1], frame, entry[3])

                    self._submit_pending_write(path, write_npz)
                else:
                    self._submit_pending_write(
                        path,
                        lambda fn=fn, frame=frame, path=path: fn(frame, path),
                    )
        else:
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(lambda w: w[0](w[1], w[2]), writes))

        _mark("writes")
        if show_clustering:
            if l2_spectra is None:
                # deferred-merge run: the plot needs host values —
                # materialize and apply the same density filter
                l2_spectra = _l2().loc[density_filter, :]
            topics_dist = np.asarray(
                pairwise_euclidean(
                    jnp.asarray(l2_spectra.values.astype(self.compute_dtype))
                )
            )
            clustergram(
                topics_dist,
                kmeans_cluster_labels.values,
                local_density.values,
                density_threshold,
                density_filter.values,
                self.paths["clustering_plot"] % (k, density_threshold_repl),
                close_fig=close_clustergram_fig,
            )

        if build_ref:
            if os.environ.get("CNMF_TPU_ASYNC_WRITES", "0") == "1":
                # queued AFTER the eight result writes on the same single
                # writer thread, so the gene_spectra_tpm txt it reads back
                # (the contract's float round-trip, reference cnmf.py:1098)
                # is already durable when it runs; both starcat outputs
                # register against the one future
                self._submit_pending_write(
                    self.paths["starcat_spectra"] % (k, density_threshold_repl),
                    lambda: self.build_reference(k, density_threshold),
                    extra_paths=(
                        self.paths["starcat_spectra__txt"]
                        % (k, density_threshold_repl),
                    ),
                )
            else:
                self.build_reference(k, density_threshold)
        _mark("plots+ref")
        # consensus has fetched everything it needs from the device — a
        # gate-held deferred spectra drain may take the channel now
        self._release_drains()
        if _trace:
            import sys
            parts = " ".join(
                f"{lbl} {t1 - t0:.2f}s"
                for (_, t0), (lbl, t1) in zip(_marks, _marks[1:])
            )
            print(f"[cnmf-tpu timing] consensus k={k}: {parts}",
                  file=sys.stderr, flush=True)

    # ==================================================================
    # starCAT reference
    # ==================================================================

    def build_reference(self, k, density_threshold=DEFAULT_DENSITY_THRESHOLD,
                        target_sum=1e6):
        """starCAT reference GEPs for (k, dt): rows renormalized to
        ``target_sum``, divided by the per-gene TPM std, subset to the HVGs,
        indexed ``GEP{i}``.

        Contract quirk kept (reference cnmf.py:1085-1116): the TPM spectra
        reload from the TEXT file, not the npz, so the float round-trip
        through the txt formatting is part of the output."""
        dt_tag = str(density_threshold).replace(".", "_")
        # a consensus with CNMF_TPU_ASYNC_WRITES=1 may still have the txt in
        # flight on the background writer; join it (when build_reference
        # itself runs ON the writer thread — queued by consensus — the txt
        # write is already complete: the one writer runs FIFO)
        self._flush_pending_write(self.paths["gene_spectra_tpm__txt"] % (k, dt_tag))
        geps = pd.read_csv(
            self.paths["gene_spectra_tpm__txt"] % (k, dt_tag), index_col=0, sep="\t"
        )
        gene_std = load_df_from_npz(self.paths["tpm_stats"])["__std"].to_numpy()
        hvgs = open(self.paths["nmf_genes_list"]).read().split("\n")

        # the renorm/varnorm math runs in numpy: two pandas flex-divides on a
        # k × 20k-gene frame cost ~1 s of blockwise/alignment overhead on
        # this one-vCPU host vs ~5 ms for the identical float64 array ops
        # (gene_std is stats-file ordered == geps column ordered)
        vals = geps.to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # zero-std genes yield inf/nan exactly as the pandas divide did;
            # they are never in the HVG subset selected below
            vals = vals / vals.sum(axis=1, keepdims=True) * target_sum
            vals = vals / gene_std[None, :]
        cols = geps.columns.get_indexer(hvgs)
        if (cols < 0).any():
            missing = [h for h, i in zip(hvgs, cols) if i < 0]
            raise KeyError(missing)
        ref_spectra = pd.DataFrame(
            vals[:, cols],
            index="GEP" + geps.index.astype("str"),
            columns=pd.Index(hvgs),
        )

        save_df_to_npz(ref_spectra, self.paths["starcat_spectra"] % (k, dt_tag))
        save_df_to_text(ref_spectra, self.paths["starcat_spectra__txt"] % (k, dt_tag))

    # ==================================================================
    # k selection
    # ==================================================================

    def _dispatch_k_stats(self, k, l2_values, nmf_kwargs, norm_counts):
        """Dispatch the fused K-stats device program (ops/kstats.py) for one
        K; returns unsynchronized device scalars (silhouette, sse) so a
        K sweep can enqueue every program before fetching any result.

        ``l2_values`` is either host L2-normalized spectra (numpy) or the
        DEVICE-RESIDENT raw merged spectra twin (CNMF_TPU_DEVICE_SPECTRA):
        the device program normalizes, pads and seeds (threefry kmeans++)
        in-trace, so the sweep ships no spectra bytes at all."""
        n_cells = norm_counts.X.shape[0]
        norm_counts_dev = self._device_cached(
            "_norm_counts_dev_cache", norm_counts,
            lambda: self._to_device_dense(norm_counts.X),
        )
        beta = beta_loss_to_float(nmf_kwargs.get("beta_loss", "frobenius"))
        l1_reg_W, _, l2_reg_W, _ = compute_regularization(
            float(nmf_kwargs.get("alpha_W", 0.0)),
            nmf_kwargs.get("alpha_H", "same"),
            float(nmf_kwargs.get("l1_ratio", 0.0)),
            (n_cells, norm_counts_dev.shape[1]),
        )
        common = dict(
            solver=nmf_kwargs.get("solver", "cd"), beta=beta,
            refit_tol=float(nmf_kwargs.get("tol", 1e-4)),
            refit_max_iter=int(nmf_kwargs.get("max_iter", 200)),
            l1_reg_W=l1_reg_W, l2_reg_W=l2_reg_W,
            use_pallas=(
                mu_pallas_eligible(
                    beta, self.compute_dtype,
                    shape=(n_cells, norm_counts_dev.shape[1]),
                )
                if nmf_kwargs.get("solver", "cd") == "mu"
                else cd_pallas_eligible(
                    (n_cells, norm_counts_dev.shape[1]), self.compute_dtype
                )
            ),
            n_cells=n_cells,
        )
        if isinstance(l2_values, jax.Array):
            return consensus_k_stats_device(
                norm_counts_dev, l2_values, int(k), **common
            )
        return consensus_k_stats(
            norm_counts_dev,
            np.ascontiguousarray(l2_values, dtype=self.compute_dtype),
            int(k), **common,
        )

    def _k_stats_spectra_input(self, k):
        """Resolve the spectra input for one K of the stats sweep: the
        device-resident raw twin when a same-process factorize left one and
        the knobs apply (device kmeans++ is the seeding the device program
        uses, so both knobs gate), else the host L2-normalized merged
        values. Returns (input, merged_frame_or_None)."""
        merged_path = self.paths["merged_spectra"] % k
        merged = self._recall_artifact(merged_path, copy=False)
        use_dev = (
            device_spectra_enabled()
            and device_kmeanspp_enabled()
        )
        if use_dev:
            if merged is None:
                meta = self._deferred_merged_meta(merged_path)
                if meta is not None and meta[3] is not None:
                    packed, off, rows = meta[3]
                    try:
                        return packed[off:off + rows], None
                    except Exception:
                        pass
            else:
                twin = self._device_spectra_twin(k, merged)
                if twin is not None:
                    return twin, merged
        if merged is None:
            # a deferred/async combine write may still be in flight
            self._flush_pending_write(merged_path)
            merged = self._recall_artifact(merged_path, copy=False)
            if merged is None:
                merged = load_df_from_npz(merged_path)
        norms = np.sqrt((merged.values ** 2).sum(axis=1))
        return merged.values / norms[:, None], merged

    @timed("k_selection_plot")
    def k_selection_plot(self, close_fig=False):
        """Stability (silhouette) vs reconstruction-error K sweep
        (reference cnmf.py:1119-1158; Alexandrov et al. 2013).

        All per-K fused stats programs are dispatched before any result is
        fetched — JAX's async dispatch overlaps the device queue with the
        host-side spectra loading/seeding of subsequent Ks."""
        run_params = load_df_from_npz(self.paths["nmf_replicate_parameters"])
        norm_counts = self._read_h5ad_cached(self.paths["normalized_counts"])
        nmf_kwargs = yaml.load(
            open(self.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
        )
        self._autowarm_sweep(norm_shape=norm_counts.X.shape)
        pending = []
        for k in sorted(set(run_params.n_components)):
            spectra_in, _ = self._k_stats_spectra_input(k)
            sil_dev, sse_dev = self._dispatch_k_stats(
                k, spectra_in, nmf_kwargs, norm_counts
            )
            pending.append((int(k), sil_dev, sse_dev))
        stats = pd.DataFrame(
            [
                pd.Series(
                    [k, DEFAULT_DENSITY_THRESHOLD, float(sil), float(sse)],
                    index=K_STATS_FIELDS,
                )
                for k, sil, sse in pending
            ]
        )
        stats.reset_index(drop=True, inplace=True)
        # every K's stats are fetched — a gate-held deferred spectra drain
        # may take the channel now (held through the sweep so no per-K
        # program queued behind the bulk transfer)
        self._release_drains()
        save_df_to_npz(stats, self.paths["k_selection_stats"])
        k_selection_figure(stats, self.paths["k_selection_plot"], close_fig=close_fig)
        return stats

    # ==================================================================
    # results loading
    # ==================================================================

    def load_results(self, K, density_threshold, n_top_genes=100, norm_usage=True):
        """Load the (K, dt) result set back from the user-facing TEXT files:
        usages (optionally row-normalized to sum 1), spectra z-scores and TPM
        spectra transposed to genes × GEPs, and the top ``n_top_genes``
        marker genes per GEP ranked by z-score (reference cnmf.py:1161-1210,
        including the int-cast-with-fallback on usage columns)."""
        dt_tag = str(density_threshold).replace(".", "_")

        def read_t(key):
            # join an in-flight background write (CNMF_TPU_ASYNC_WRITES)
            self._flush_pending_write(self.paths[key] % (K, dt_tag))
            return pd.read_csv(
                self.paths[key] % (K, dt_tag), sep="\t", index_col=0
            )

        spectra_scores = read_t("gene_spectra_score__txt").T
        spectra_tpm = read_t("gene_spectra_tpm__txt").T
        usage = read_t("consensus_usages__txt")

        if norm_usage:
            usage = usage.div(usage.sum(axis=1), axis=0)
        try:
            usage.columns = [int(x) for x in usage.columns]
        except Exception:
            print("Usage matrix columns include non integer values")

        top_genes = pd.DataFrame(
            {
                gep: spectra_scores[gep].sort_values(ascending=False)
                     .index[:n_top_genes]
                for gep in spectra_scores.columns
            }
        )
        return usage, spectra_scores, spectra_tpm, top_genes
