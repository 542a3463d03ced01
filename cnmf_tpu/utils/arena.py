"""Reused host buffers for prepare's large per-run temporaries.

Round-4 measurement (TODO.md "in-bench prepare inflation"): a second
same-process pipeline run's prepare measures 2-3x slower on EVERY host
memory pass because the ~0.5 GB of per-run temporaries (TPM multiply
output, the f64 norm cast, the storage-dtype h5ad casts) are freed between
runs and re-faulted as fresh pages — this host's fresh-page fault path
runs at 60-180 MB/s vs 2-4.5 GB/s for warm reuse (CLAUDE.md host
characteristics). The fix is to hand those passes a reused, already-warm
buffer instead of a fresh allocation (reference contrast: the reference's
prepare, cnmf.py:333-459, allocates freshly every call — fine on a
many-core host, ~2-3x prepare wall here).

Safety: a slot is reused ONLY when nothing outside the arena references
it. Every numpy view chains a strong reference to its base buffer, so
``sys.getrefcount`` on the flat slot sees any outstanding consumer —
including the h5ad read-cache AnnData, an async writer thread's queued
array, or a device-transfer source — and the arena allocates fresh
instead of aliasing. Thread-safe; reuse is disabled with
``CNMF_TPU_HOST_ARENA=0``.
"""

from __future__ import annotations

import os
import sys
import threading

import numpy as np

# below this, a fresh allocation is cheap and slot bookkeeping is noise
_MIN_BYTES = 16 << 20
# total resident cap across slots; beyond it the largest FREE slot is
# evicted (freeing it returns the pages to the allocator)
_MAX_TOTAL_BYTES = 6 << 30


def _enabled() -> bool:
    return os.environ.get("CNMF_TPU_HOST_ARENA", "1") != "0"


class HostArena:
    """Refcount-guarded pool of flat byte buffers.

    ``take(shape, dtype)`` returns an uninitialized array of the requested
    shape backed by a reused warm slot when one is free, else by a fresh
    slot registered for future reuse. The returned array is a view chain
    onto the slot; while any consumer holds it (or a view of it), the
    slot's refcount is elevated and the arena will not hand it out again.
    """

    def __init__(self, min_bytes: int = _MIN_BYTES,
                 max_total_bytes: int = _MAX_TOTAL_BYTES):
        self._slots: list[np.ndarray] = []
        self._lock = threading.Lock()
        self.min_bytes = int(min_bytes)
        self.max_total_bytes = int(max_total_bytes)
        self.hits = 0
        self.misses = 0

    # the refcount a FREE slot measures through _free's exact call shape
    # (list entry + loop/comprehension binding + parameter + getrefcount's
    # argument) — CALIBRATED at import via _calibrate_free_refs() below so
    # a CPython change to argument-passing refcount conventions shifts the
    # baseline with it instead of silently turning the guard into aliasing
    _FREE_REFS = 0

    @staticmethod
    def _refs(slot: np.ndarray) -> int:
        return sys.getrefcount(slot)

    @staticmethod
    def _free(slot: np.ndarray) -> bool:
        # equality, not >=: a call site that binds differently (e.g. a
        # temporary instead of a loop variable) measures BELOW the baseline
        # and is treated as held — the conservative direction. Anything
        # above the baseline is an outstanding consumer — views chain a
        # strong ref to their base, so slices/reshapes/casts all count
        return HostArena._refs(slot) == HostArena._FREE_REFS

    def take(self, shape, dtype) -> np.ndarray:
        dtype = np.dtype(dtype)
        shape = tuple(int(s) for s in shape)
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
        if nbytes < self.min_bytes or not _enabled():
            return np.empty(shape, dtype)
        with self._lock:
            # smallest adequate free slot, so a big slot isn't burned on a
            # small request while a right-sized one sits idle
            best = None
            for slot in self._slots:
                if slot.nbytes >= nbytes and self._free(slot):
                    if best is None or slot.nbytes < best.nbytes:
                        best = slot
            if best is not None:
                self.hits += 1
                return best[:nbytes].view(dtype).reshape(shape)
            self.misses += 1
            slot = np.empty(nbytes, np.uint8)
            self._slots.append(slot)
            self._evict_over_cap()
            return slot.view(dtype).reshape(shape)

    def _evict_over_cap(self):
        total = sum(s.nbytes for s in self._slots)
        while total > self.max_total_bytes:
            free = [s for s in self._slots if self._free(s)]
            if not free:
                return
            victim = max(free, key=lambda s: s.nbytes)
            self._slots.remove(victim)
            total -= victim.nbytes

    def clear(self):
        """Drop every free slot (held ones stay until consumers release)."""
        with self._lock:
            self._slots = [s for s in self._slots if not self._free(s)]


def _calibrate_free_refs() -> int:
    """Refcount of a definitionally-free slot measured through the same
    call shape ``_free`` uses: list entry + loop binding + one wrapper
    frame + ``_refs``'s parameter + getrefcount's argument."""
    def probe(slot: np.ndarray) -> int:
        return HostArena._refs(slot)

    slots = [np.empty(0, np.uint8)]
    for slot in slots:
        return probe(slot)
    raise AssertionError("unreachable")


HostArena._FREE_REFS = _calibrate_free_refs()

host_arena = HostArena()
