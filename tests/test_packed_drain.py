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
