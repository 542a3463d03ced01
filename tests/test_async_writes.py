"""CNMF_TPU_ASYNC_WRITES=1 — background prepare-artifact writes.

The knob dispatches prepare's h5ad writes (tpm + norm_counts, the
writeback-throttled bulk of prepare wall at scale) to a single writer thread
so they overlap the device-bound factorize stage in a same-process pipeline.
These tests pin the semantics: artifacts land identical to the synchronous
path, same-process readers join the pending write transparently, failures
surface at flush, and the seeded read cache still honors external rewrites.
"""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import AnnData, cNMF, write_h5ad
from cnmf_tpu.io.h5ad import read_h5ad


@pytest.fixture()
def counts_fn(tmp_path):
    rng = np.random.RandomState(3)
    counts = rng.binomial(200, 0.02, size=(60, 120)).astype(np.float64)
    counts[counts.sum(axis=1) == 0, 0] = 1
    fn = str(tmp_path / "counts.h5ad")
    write_h5ad(fn, AnnData(
        counts,
        obs=pd.DataFrame(index=[f"c{i}" for i in range(60)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(120)]),
    ))
    return fn


def _prepare(tmp_path, counts_fn, name):
    obj = cNMF(output_dir=str(tmp_path), name=name)
    obj.prepare(counts_fn=counts_fn, components=[4], n_iter=2, seed=7,
                num_highvar_genes=50)
    return obj


def test_async_artifacts_match_sync(tmp_path, counts_fn, monkeypatch):
    sync_obj = _prepare(tmp_path, counts_fn, "sync")
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    async_obj = _prepare(tmp_path, counts_fn, "async")
    async_obj.flush_writes()
    for key in ("tpm", "normalized_counts"):
        a = read_h5ad(sync_obj.paths[key])
        b = read_h5ad(async_obj.paths[key])
        np.testing.assert_array_equal(
            np.asarray(a.X.todense() if hasattr(a.X, "todense") else a.X),
            np.asarray(b.X.todense() if hasattr(b.X, "todense") else b.X),
        )
        assert list(a.var.index) == list(b.var.index)


def test_same_process_read_joins_pending_write(tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "joined")
    # no explicit flush: the cached read must join the in-flight write (or
    # hit the cache the writer seeded) rather than fail on a missing/partial
    # file
    adata = obj._read_h5ad_cached(obj.paths["normalized_counts"])
    assert adata.X.shape[0] == 60
    obj.flush_writes()


def test_end_to_end_pipeline_with_async_writes(tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = cNMF(output_dir=str(tmp_path), name="e2e")
    obj.prepare(counts_fn=counts_fn, components=[4], n_iter=10, seed=7,
                num_highvar_genes=50)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
    assert os.path.exists(
        obj.paths["consensus_spectra__txt"] % (4, "2_0")
    )


def test_external_rewrite_invalidates_seeded_cache(tmp_path, counts_fn,
                                                   monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "inval")
    obj.flush_writes()
    path = obj.paths["normalized_counts"]
    seeded = obj._read_h5ad_cached(path)
    replacement = AnnData(
        np.ones((2, 3)),
        obs=pd.DataFrame(index=["a", "b"]),
        var=pd.DataFrame(index=["x", "y", "z"]),
    )
    # out-of-band rewrite (another worker, a re-run): mtime changes must win
    # over the seeded cache entry
    os.utime(path, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    write_h5ad(path, replacement)
    reread = obj._read_h5ad_cached(path)
    assert reread.X.shape != seeded.X.shape


def test_flush_surfaces_write_failure(tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = cNMF(output_dir=str(tmp_path), name="fail")
    obj._initialize_dirs()
    bad = AnnData(
        np.ones((2, 2)),
        obs=pd.DataFrame(index=["a", "b"]),
        var=pd.DataFrame(index=["x", "y"]),
    )
    obj._write_prepare_h5ad(
        os.path.join(str(tmp_path), "no_such_dir", "x.h5ad"), bad
    )
    with pytest.raises(Exception):
        obj.flush_writes()


def test_async_combine_merged_write(tmp_path, counts_fn, monkeypatch):
    """Round-5: combine's merged-spectra npz rides the writer thread too.
    The memo (PENDING stat) serves in-process consensus immediately; the
    file lands identical to the synchronous path after flush; a fresh
    object (no memo) reads it correctly."""
    from cnmf_tpu.io.dataframe import load_df_from_npz

    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "0")
    sync = _prepare(tmp_path, counts_fn, "sync_c")
    sync.factorize(verbose=False)
    sync.combine()
    ref = load_df_from_npz(sync.paths["merged_spectra"] % 4)

    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "async_c")
    obj.factorize(verbose=False)
    obj.combine()
    # consensus consumes the memo (and must not need the file yet)
    obj.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                  show_clustering=False)
    obj.flush_writes()
    got = load_df_from_npz(obj.paths["merged_spectra"] % 4)
    np.testing.assert_array_equal(got.values, ref.values)
    assert list(got.index) == list(ref.index)

    # a fresh object (no memo) must read the durable file
    fresh = cNMF(output_dir=str(tmp_path), name="async_c")
    fresh.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                    show_clustering=False)


def test_async_combine_memo_declined_writes_synchronously(
        tmp_path, counts_fn, monkeypatch):
    """If the artifact memo declines the entry (byte cap), readers would
    hit the FILE — combine must then write synchronously."""
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "declined")
    obj.factorize(verbose=False)
    monkeypatch.setattr(obj, "_ARTIFACT_MEMO_BYTES", 0)
    monkeypatch.setattr(obj, "_STACK_MEMO_BYTES", 0, raising=False)
    obj.combine()
    # durable immediately, without any flush
    from cnmf_tpu.io.dataframe import load_df_from_npz

    got = load_df_from_npz(obj.paths["merged_spectra"] % 4)
    assert got.shape[0] == 2 * 4
