"""Reused host arena for prepare's large temporaries (utils/arena).

Round-4 measurement: repeat same-process prepares ran 2-3x slower because
the ~0.5 GB of per-run temporaries were freed and re-faulted as fresh
pages (60-180 MB/s vs 2-4.5 GB/s warm on this host). The arena reuses
those buffers; values must be bit-identical with the arena on or off, and
a held buffer must never be handed out again (refcount guard).
"""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cNMF
from cnmf_tpu.io.h5ad import read_h5ad
from cnmf_tpu.ops.normalize import normalize_total, scale_unit_variance
from cnmf_tpu.utils.arena import HostArena, host_arena


def test_refcount_guarded_reuse():
    a = HostArena(min_bytes=1024)
    x = a.take((100, 40), np.float64)
    assert x.shape == (100, 40) and x.dtype == np.float64
    del x
    y = a.take((100, 40), np.float64)
    assert len(a._slots) == 1, "freed slot not reused"
    z = a.take((100, 40), np.float64)
    assert len(a._slots) == 2, "held slot aliased"
    # a VIEW of a handed-out buffer also pins the slot
    v = z[:10]
    del z
    w = a.take((100, 40), np.float64)
    assert len(a._slots) == 3, "slot aliased while a view is alive"
    del v, w, y
    # smaller request reuses the smallest adequate free slot
    s = a.take((50, 40), np.float64)
    assert len(a._slots) == 3
    del s


def test_small_requests_bypass():
    a = HostArena(min_bytes=1 << 20)
    x = a.take((10, 10), np.float64)
    assert a._slots == [] and x.shape == (10, 10)


def test_eviction_respects_cap():
    a = HostArena(min_bytes=1024, max_total_bytes=1 << 20)
    x = a.take((1 << 19,), np.uint8)
    y = a.take((1 << 19,), np.uint8)
    z = a.take((1 << 19,), np.uint8)  # over cap, x/y/z all held: no evict
    assert len(a._slots) == 3
    del x, y, z
    a.take((1 << 19,), np.uint8)  # next take prunes free slots over cap
    assert sum(s.nbytes for s in a._slots) <= (1 << 20) + (1 << 19)


def test_normalize_scale_bit_identical(monkeypatch):
    rng = np.random.RandomState(3)
    X = rng.poisson(2.0, size=(300, 500)).astype(np.int64)
    monkeypatch.setenv("CNMF_TPU_HOST_ARENA", "0")
    t0 = np.asarray(normalize_total(X))
    monkeypatch.setenv("CNMF_TPU_HOST_ARENA", "1")
    monkeypatch.setattr(host_arena, "min_bytes", 0)
    t1 = np.asarray(normalize_total(X))
    np.testing.assert_array_equal(t0, t1)

    Xf = X.astype(np.float64)
    s0, sd0 = scale_unit_variance(Xf.copy(), ddof=1, zero_safe=False,
                                  return_std=True)
    s1, sd1 = scale_unit_variance(Xf.copy(), ddof=1, zero_safe=False,
                                  return_std=True, inplace=True)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_array_equal(sd0, sd1)


def test_prepare_twice_reuses_and_matches(tmp_path, monkeypatch):
    """Second prepare (fresh object, run-1 references dropped) hits the
    arena and produces bit-identical artifacts to an arena-off run."""
    monkeypatch.setattr(host_arena, "min_bytes", 0)
    rng = np.random.RandomState(5)
    X = rng.poisson(1.5, size=(120, 180)).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(180)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    cfg = dict(components=[4], n_iter=3, seed=2, num_highvar_genes=90)

    monkeypatch.setenv("CNMF_TPU_HOST_ARENA", "0")
    ref = cNMF(output_dir=str(tmp_path), name="off")
    ref.prepare(counts_fn=fn, **cfg)
    tpm_off = read_h5ad(ref.paths["tpm"]).X.copy()
    norm_off = read_h5ad(ref.paths["normalized_counts"]).X.copy()
    del ref

    monkeypatch.setenv("CNMF_TPU_HOST_ARENA", "1")
    for name in ("on1", "on2"):
        before = host_arena.hits
        obj = cNMF(output_dir=str(tmp_path), name=name)
        obj.prepare(counts_fn=fn, **cfg)
        tpm_on = read_h5ad(obj.paths["tpm"]).X
        norm_on = read_h5ad(obj.paths["normalized_counts"]).X
        np.testing.assert_array_equal(np.asarray(tpm_on), np.asarray(tpm_off))
        np.testing.assert_array_equal(np.asarray(norm_on),
                                      np.asarray(norm_off))
        del obj, tpm_on, norm_on
        if name == "on2":
            assert host_arena.hits > before, (
                "second prepare did not reuse any arena slot"
            )
