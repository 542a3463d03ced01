"""CNMF_TPU_DRAIN_HOLD_S — gate-held deferred packed drain scheduling.

The deferred drain's bytes are not on the headline's critical path, but its
slot on the relay's single ordered channel is: bench run E measured the fused
consensus program queueing behind the 64.8 MB packed transfer. With a hold
configured, the writer's d→h fetch waits until the pipeline signals the
channel is clear — end of consensus / end of the K sweep — or until a reader
joins / a flush wants durability (both release immediately), or the timeout
elapses (bounds write latency for a caller that never does any of those).

CPU defaults the hold to 0 (no relay to schedule around); these tests set the
knob explicitly and verify every release path fires well under the hold.
"""

import os
import time

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import AnnData, cNMF, write_h5ad
from cnmf_tpu.io.dataframe import load_df_from_npz

HOLD_S = "120"  # far above any test's real runtime: a missed release hangs


@pytest.fixture(autouse=True)
def _deferred_drain_env(monkeypatch):
    monkeypatch.setenv("CNMF_TPU_ASYNC_WRITES", "1")
    monkeypatch.setenv("CNMF_TPU_DEVICE_SPECTRA", "force")
    monkeypatch.setenv("CNMF_TPU_DEVICE_KMEANSPP", "force")
    monkeypatch.setenv("CNMF_TPU_DRAIN_HOLD_S", HOLD_S)


@pytest.fixture()
def counts_fn(tmp_path):
    rng = np.random.RandomState(8)
    counts = rng.binomial(200, 0.02, size=(60, 120)).astype(np.float64)
    counts[counts.sum(axis=1) == 0, 0] = 1
    fn = str(tmp_path / "counts.h5ad")
    write_h5ad(fn, AnnData(
        counts,
        obs=pd.DataFrame(index=[f"c{i}" for i in range(60)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(120)]),
    ))
    return fn


def _prep_factorize(tmp_path, counts_fn, name, ks=(4,), n_iter=6):
    obj = cNMF(output_dir=str(tmp_path), name=name)
    obj.prepare(counts_fn=counts_fn, components=list(ks), n_iter=n_iter,
                seed=7, num_highvar_genes=50)
    obj.factorize(verbose=False, use_mesh=False)
    return obj


def test_consensus_end_releases_hold(tmp_path, counts_fn):
    """factorize registers a hold gate; consensus() opens it at its end and
    the drained files land without waiting anywhere near the hold."""
    t0 = time.perf_counter()
    obj = _prep_factorize(tmp_path, counts_fn, "hold")
    holds = list(getattr(obj, "_drain_holds", []))
    assert len(holds) == 1 and not holds[0].is_set()
    obj.combine()
    assert not holds[0].is_set()  # combine defers; the gate stays closed
    obj.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                  show_clustering=False)
    assert holds[0].is_set()
    assert getattr(obj, "_drain_holds", []) == []
    obj.flush_writes()
    assert time.perf_counter() - t0 < float(HOLD_S) / 2
    assert os.path.exists(obj.paths["iter_spectra"] % (4, 0))
    usages = load_df_from_npz(obj.paths["consensus_usages"] % (4, "2_0"))
    assert usages.shape == (60, 4)


def test_reader_join_releases_hold(tmp_path, counts_fn):
    """A direct combine_nmf() (joining reader) opens the gate instead of
    stalling behind it; the returned frame matches the drained file."""
    t0 = time.perf_counter()
    obj = _prep_factorize(tmp_path, counts_fn, "join")
    frame = obj.combine_nmf(4)
    assert frame.shape == (6 * 4, 50)
    obj.flush_writes()
    assert time.perf_counter() - t0 < float(HOLD_S) / 2
    on_disk = load_df_from_npz(obj.paths["merged_spectra"] % 4)
    np.testing.assert_array_equal(frame.values, on_disk.values)


def test_flush_releases_hold(tmp_path, counts_fn):
    t0 = time.perf_counter()
    obj = _prep_factorize(tmp_path, counts_fn, "flush")
    obj.flush_writes()
    assert time.perf_counter() - t0 < float(HOLD_S) / 2
    for it in range(6):
        assert os.path.exists(obj.paths["iter_spectra"] % (4, it))


def test_k_selection_sweep_releases_hold(tmp_path, counts_fn):
    t0 = time.perf_counter()
    obj = _prep_factorize(tmp_path, counts_fn, "sweep", ks=(3, 4))
    obj.combine()
    holds = list(getattr(obj, "_drain_holds", []))
    assert len(holds) == 1 and not holds[0].is_set()
    obj.k_selection_plot(close_fig=True)
    assert holds[0].is_set()
    obj.flush_writes()
    assert time.perf_counter() - t0 < float(HOLD_S) / 2
    assert os.path.exists(obj.paths["k_selection_stats"])


def test_hold_timeout_is_a_backstop(tmp_path, counts_fn, monkeypatch):
    """With a short hold and NO release call, the drain proceeds on its own
    after the timeout — a caller that never consumes or flushes still gets
    durable files."""
    monkeypatch.setenv("CNMF_TPU_DRAIN_HOLD_S", "0.2")
    obj = _prep_factorize(tmp_path, counts_fn, "timeout")
    path = obj.paths["iter_spectra"] % (4, 0)
    deadline = time.perf_counter() + 30.0
    while not os.path.exists(path) and time.perf_counter() < deadline:
        time.sleep(0.05)
    assert os.path.exists(path)
    obj.flush_writes()


def test_artifacts_match_unheld_run(tmp_path, counts_fn, monkeypatch):
    """The hold only reschedules the transfer — artifacts are byte-identical
    to the unheld deferred run."""
    held = _prep_factorize(tmp_path, counts_fn, "held")
    held.combine()
    held.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                   show_clustering=False)
    held.flush_writes()

    monkeypatch.setenv("CNMF_TPU_DRAIN_HOLD_S", "0")
    plain = _prep_factorize(tmp_path, counts_fn, "plain")
    plain.combine()
    plain.consensus(k=4, density_threshold=2.0, local_neighborhood_size=2.0,
                    show_clustering=False)
    plain.flush_writes()

    for key, args in [("iter_spectra", (4, 0)), ("merged_spectra", (4,)),
                      ("consensus_usages", (4, "2_0")),
                      ("consensus_spectra", (4, "2_0"))]:
        a = load_df_from_npz(held.paths[key] % args)
        b = load_df_from_npz(plain.paths[key] % args)
        np.testing.assert_array_equal(a.values, b.values)
