"""Per-bucket packed result transfer (ops.nmf.pack_spectra_true_k +
factorize's drain_packed) must be byte-identical to the per-K sliced drain:
the pack only concatenates the true-K rows the per-K path slices anyway.

Covers the multi-K case (two Ks sharing the pad-8 bucket plus one in the
pad-16 bucket → two packed buffers) against a factorize forced down the
per-K slice path via ``restart_chunk`` (chunk >= B keeps the identical
single-batch solve; only the drain differs)."""

import numpy as np
import pandas as pd

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz


def test_packed_drain_matches_per_k(tmp_path):
    rng = np.random.RandomState(11)
    W = rng.gamma(0.7, 1.0, size=(120, 6))
    H = rng.gamma(0.5, 1.0, size=(6, 180)) * (rng.rand(6, 180) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(180)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    ks, n_iter = [5, 7, 9], 4
    packed = cNMF(output_dir=str(tmp_path), name="packed")
    packed.prepare(counts_fn=fn, components=ks, n_iter=n_iter, seed=3,
                   num_highvar_genes=100)
    # use_mesh=False → single-array handles → the packed bucket drain
    packed.factorize(verbose=False, use_mesh=False)

    perk = cNMF(output_dir=str(tmp_path), name="perk")
    perk.prepare(counts_fn=fn, components=ks, n_iter=n_iter, seed=3,
                 num_highvar_genes=100)
    # restart_chunk set → pack_ok False → the per-K slice drain, with the
    # same single-batch solve (chunk >= B)
    perk.factorize(verbose=False, use_mesh=False, restart_chunk=10_000)

    for k in ks:
        for it in range(n_iter):
            a = load_df_from_npz(packed.paths["iter_spectra"] % (k, it))
            b = load_df_from_npz(perk.paths["iter_spectra"] % (k, it))
            assert a.shape == (k, 100)
            np.testing.assert_array_equal(a.values, b.values)
            assert list(a.index) == list(b.index)


def test_pack_all_single_transfer(tmp_path, monkeypatch):
    """CNMF_TPU_PACK_ALL merges every bucket into ONE pack dispatch (round-5
    VERDICT #5: fewer/larger d→h ops); artifacts stay byte-identical to the
    per-bucket variant."""
    rng = np.random.RandomState(12)
    W = rng.gamma(0.7, 1.0, size=(110, 6))
    H = rng.gamma(0.5, 1.0, size=(6, 160)) * (rng.rand(6, 160) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(110)],
                      columns=[f"g{j}" for j in range(160)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    ks, n_iter = [5, 7, 9], 3
    cfg = dict(components=ks, n_iter=n_iter, seed=6, num_highvar_genes=90)

    import cnmf_tpu.pipeline.cnmf as cnmf_mod

    calls = []
    orig = cnmf_mod.pack_spectra_true_k

    def spy(handles, *, ks):
        calls.append(tuple(ks))
        return orig(handles, ks=ks)

    monkeypatch.setattr(cnmf_mod, "pack_spectra_true_k", spy)

    monkeypatch.setenv("CNMF_TPU_PACK_ALL", "1")
    a = cNMF(output_dir=str(tmp_path), name="all")
    a.prepare(counts_fn=fn, **cfg)
    a.factorize(verbose=False, use_mesh=False)
    assert calls == [(5, 7, 9)], calls  # one pack across both pad buckets

    calls.clear()
    monkeypatch.setenv("CNMF_TPU_PACK_ALL", "0")
    b = cNMF(output_dir=str(tmp_path), name="bucket")
    b.prepare(counts_fn=fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)
    assert calls == [(5, 7), (9,)], calls  # one pack per pad bucket

    for k in ks:
        for it in range(n_iter):
            sa = load_df_from_npz(a.paths["iter_spectra"] % (k, it))
            sb = load_df_from_npz(b.paths["iter_spectra"] % (k, it))
            np.testing.assert_array_equal(sa.values, sb.values)
