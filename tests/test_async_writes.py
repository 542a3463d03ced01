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
    # round-5: consensus artifacts ride the writer too — durable after flush
    obj.flush_writes()
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


# ----------------------------------------------------------------------
# round-5: factorize's per-iteration writes and consensus's result files
# ride the background writer too
# ----------------------------------------------------------------------

def _artifact_paths(obj, k, dt):
    keys = ["consensus_spectra", "consensus_usages", "gene_spectra_tpm",
            "gene_spectra_score", "starcat_spectra"]
    out = []
    for key in keys:
        out.append(obj.paths[key] % (k, dt))
        out.append(obj.paths[key + "__txt"] % (k, dt))
    return out


def test_async_consensus_artifacts_match_sync(tmp_path, counts_fn, monkeypatch):
    """All ten consensus/build_reference artifacts (npz + txt) land
    byte-identical to the synchronous path after flush — including the
    build_reference txt-round-trip quirk (reference cnmf.py:1098)."""
    from cnmf_tpu.io.dataframe import load_df_from_npz

    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "0")
    sync = _prepare(tmp_path, counts_fn, "sync_k")
    sync.factorize(verbose=False)
    sync.combine()
    sync.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                   show_clustering=False)

    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "async_k")
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                  show_clustering=False)
    obj.flush_writes()

    for p_sync, p_async in zip(_artifact_paths(sync, 4, "2_0"),
                               _artifact_paths(obj, 4, "2_0")):
        if p_sync.endswith(".txt"):
            with open(p_sync, "rb") as a, open(p_async, "rb") as b:
                assert a.read() == b.read(), p_async
        else:
            a = load_df_from_npz(p_sync)
            b = load_df_from_npz(p_async)
            np.testing.assert_array_equal(a.values, b.values)
            assert list(a.index) == list(b.index)


def test_factorize_iter_writes_pending_combine_uses_stack_memo(
        tmp_path, counts_fn, monkeypatch):
    """With the writer deterministically stalled, factorize's per-iteration
    files are NOT on disk when combine runs: the existence scan must count
    the pending writes as existing and the stack memo must serve the
    content; files land identical after flush."""
    import threading

    from cnmf_tpu.io.dataframe import load_df_from_npz

    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "stall")
    obj.flush_writes()  # prepare artifacts durable; writer idle
    gate = threading.Event()
    obj._submit_pending_write("__test_stall__", gate.wait)
    obj.factorize(verbose=False)
    k = 4
    path0 = obj.paths["iter_spectra"] % (k, 0)
    assert not os.path.exists(path0)
    assert obj._write_pending(path0)
    obj.combine()
    gate.set()
    obj.flush_writes()
    assert os.path.exists(path0)
    merged = load_df_from_npz(obj.paths["merged_spectra"] % k)
    assert merged.shape[0] == 2 * k
    f0 = load_df_from_npz(path0)
    np.testing.assert_array_equal(f0.values, merged.values[:k])


def test_factorize_stack_memo_declined_stays_durable(
        tmp_path, counts_fn, monkeypatch):
    """If the K-stack memo declines (byte cap), factorize must keep its
    per-iteration writes durable-before-return (a same-process combine
    would read the FILES)."""
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "nostack")
    obj.flush_writes()
    monkeypatch.setattr(obj, "_STACK_MEMO_BYTES", 0, raising=False)
    obj.factorize(verbose=False)
    for it in range(2):
        assert os.path.exists(obj.paths["iter_spectra"] % (4, it))
    obj.combine()
    obj.flush_writes()


def test_load_results_joins_pending_consensus_writes(
        tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "lr")
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                  show_clustering=False)
    # no flush: load_results must join the in-flight txt writes
    usage, scores, tpm, top = obj.load_results(4, 2.0)
    assert usage.shape == (60, 4)
    assert scores.shape[1] == 4
    obj.flush_writes()


def test_build_reference_joins_pending_txt(tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "br")
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                  show_clustering=False, build_ref=False)
    # direct call with the gene_spectra_tpm txt still in flight
    obj.build_reference(4, 2.0)
    obj.flush_writes()
    assert os.path.exists(obj.paths["starcat_spectra__txt"] % (4, "2_0"))


def test_remove_individual_iterations_joins_pending_writes(
        tmp_path, counts_fn, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    obj = _prepare(tmp_path, counts_fn, "rm")
    obj.factorize(verbose=False)
    obj.combine_nmf(4, remove_individual_iterations=True)
    obj.flush_writes()
    for it in range(2):
        assert not os.path.exists(obj.paths["iter_spectra"] % (4, it))
    assert os.path.exists(obj.paths["merged_spectra"] % 4)
