"""Round-5 VERDICT #2: the WHOLE consensus as one device program.

``CNMF_TPU_DEVICE_KMEANSPP`` folds the KNN density, the density filter and
the greedy kmeans++ seeding into the fused consensus program
(ops/consensus_fused.fused_consensus_full) — no device→host→device sync
mid-consensus. The seeding swaps the numpy RandomState stream for a
threefry key (SURVEY §2.10 sanctions the substitution); on well-separated
spectra the best-of-n_init Lloyd partition is identical, so every saved
artifact must match the host-seeded fused path essentially exactly
(partition-identical ⇒ identical medians ⇒ identical deterministic
downstream refits).

Reference semantics under test: cnmf.py:874-936 (density filter + cache),
cnmf.py:908-910 (KMeans n_init=10 rs=1), tested at f64 on CPU.
"""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz

K = 5
DT = 0.5
DT_REPL = "0_5"


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("devkmeanspp")
    rng = np.random.RandomState(7)
    n_cells, n_genes, k_true = 200, 220, K
    W = rng.gamma(0.7, 1.0, size=(n_cells, k_true))
    H = rng.gamma(0.5, 1.0, size=(k_true, n_genes)) * (
        rng.rand(k_true, n_genes) < 0.35
    )
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X,
        index=[f"cell{i}" for i in range(n_cells)],
        columns=[f"gene{j}" for j in range(n_genes)],
    )
    counts_fn = str(tmp_path / "counts.txt")
    df.to_csv(counts_fn, sep="\t")

    obj = cNMF(output_dir=str(tmp_path), name="devkpp",
               compute_dtype=np.float64)
    obj.prepare(counts_fn=counts_fn, components=[K], n_iter=10, seed=11,
                num_highvar_genes=140)
    obj.factorize(verbose=False)
    obj.combine()
    return obj


def _artifacts(obj):
    return {
        name: load_df_from_npz(obj.paths[name] % (K, DT_REPL))
        for name in ("consensus_spectra", "consensus_usages",
                     "gene_spectra_tpm", "gene_spectra_score")
    }


def _consensus(obj, monkeypatch, knob, show=False):
    monkeypatch.setenv("CNMF_TPU_DEVICE_KMEANSPP", knob)
    obj.consensus(k=K, density_threshold=DT, show_clustering=show,
                  close_clustergram_fig=True)
    return _artifacts(obj)


def test_full_fused_matches_host_seeding(run, monkeypatch):
    obj = run
    cache_fn = obj.paths["local_density_cache"] % K

    # host-seeded fused path (the round-4 behavior)
    host = _consensus(obj, monkeypatch, "0")
    dens_host = load_df_from_npz(cache_fn)

    # device-seeded full-fused path, density RECOMPUTED on device
    os.remove(cache_fn)
    dev = _consensus(obj, monkeypatch, "force")
    dens_dev = load_df_from_npz(cache_fn)

    # the inline density recompute mirrors ops/distance exactly
    np.testing.assert_allclose(dens_dev.values, dens_host.values,
                               rtol=1e-10, atol=1e-12)
    # partition-identical ⇒ identical medians; the downstream refits stop at
    # the sklearn tol=1e-4 rule, and the two paths are DIFFERENT XLA
    # programs (fusion reorders f64 ops), so artifacts agree to the refit
    # convergence level, not bitwise — compare at the repo's consensus
    # contract metric (relative SSE, tests/test_consensus_oracle.py)
    for name in host:
        assert list(host[name].index) == list(dev[name].index), name
        a, b = dev[name].values, host[name].values
        rel_sse = np.sum((a - b) ** 2) / max(np.sum(b**2), 1e-30)
        assert rel_sse < 1e-6, f"{name}: relative SSE {rel_sse:.3e}"

    # cached-density branch: the memo's values enter the program verbatim,
    # so a re-run with the cache present reproduces the same artifacts;
    # show=True also smokes the clustergram under the device seeding
    cached = _consensus(obj, monkeypatch, "force", show=True)
    import os as _os

    assert _os.path.isfile(obj.paths["clustering_plot"] % (K, DT_REPL))
    for name in dev:
        np.testing.assert_allclose(
            cached[name].values, dev[name].values, rtol=1e-12, atol=1e-14,
            err_msg=name,
        )


def test_warmup_covers_full_fused_consensus(tmp_path, monkeypatch):
    """With the device seeding on, warmup must lower _fused_consensus_full
    (not the standalone density + post-seeding programs) — a warmed
    factorize→combine→consensus pass compiles nothing new."""
    import jax

    from tests.test_warmup import _MissCounter

    monkeypatch.setenv("CNMF_TPU_DEVICE_KMEANSPP", "force")
    prev_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cache"))
    try:
        rng = np.random.RandomState(31)
        W = rng.gamma(0.7, 1.0, size=(163, 6))
        H = rng.gamma(0.5, 1.0, size=(6, 210)) * (rng.rand(6, 210) < 0.35)
        X = rng.poisson(W @ H * 2.0).astype(float)
        X[X.sum(axis=1) == 0, 0] = 1
        df = pd.DataFrame(X, index=[f"c{i}" for i in range(163)],
                          columns=[f"g{j}" for j in range(210)])
        fn = str(tmp_path / "counts.txt")
        df.to_csv(fn, sep="\t")

        counter = _MissCounter().install()
        obj = cNMF(output_dir=str(tmp_path), name="wufull")
        obj.shard_cells = False
        obj.prepare(counts_fn=fn, components=[6], n_iter=6, seed=9,
                    num_highvar_genes=91)
        done = obj.warmup(verbose=False)
        assert any("fused_consensus_full" in lbl for lbl in done), done
        assert not any("knn_density" in lbl for lbl in done), (
            "standalone density program lowered despite the full-fused path"
        )
        failed = [lbl for lbl, v in done.items() if v < 0]
        assert not failed, f"warmup lowering failed for {failed}"

        counter.active = True
        obj.factorize(verbose=False, use_mesh=False)
        obj.combine()
        obj.consensus(k=6, density_threshold=0.5, show_clustering=False)
        counter.active = False
        assert counter.misses == 0, (
            f"warmed full-fused pipeline still compiled {counter.misses} "
            f"program(s) (hits={counter.hits})"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)


def test_full_fused_zero_survivors_raises(run, monkeypatch):
    obj = run
    cache_fn = obj.paths["local_density_cache"] % K
    if os.path.isfile(cache_fn):
        os.remove(cache_fn)
    monkeypatch.setenv("CNMF_TPU_DEVICE_KMEANSPP", "force")
    with pytest.raises(RuntimeError, match="Zero components remain"):
        obj.consensus(k=K, density_threshold=1e-9, show_clustering=False,
                      close_clustergram_fig=True)


def test_cached_density_f32_borderline_matches_host_filter(tmp_path,
                                                           monkeypatch):
    """A cached f64 density whose f32 rounding crosses the threshold must
    still produce the HOST filter decision in-program (fused_consensus_full
    nudges exactly those rows), or the packed labels misalign with the
    caller's kept_index. Threshold 0.30000001 f32-rounds UP to ~0.300000012;
    a cached value just below the f64 threshold rounds to the same f32 and
    would be dropped in-program without the nudge."""
    rng = np.random.RandomState(3)
    n_cells, n_genes = 120, 150
    W = rng.gamma(0.7, 1.0, size=(n_cells, K))
    H = rng.gamma(0.5, 1.0, size=(K, n_genes)) * (
        rng.rand(K, n_genes) < 0.35
    )
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X,
        index=[f"cell{i}" for i in range(n_cells)],
        columns=[f"gene{j}" for j in range(n_genes)],
    )
    counts_fn = str(tmp_path / "counts.txt")
    df.to_csv(counts_fn, sep="\t")

    # f32 compute dtype: the program compares at f32 even on CPU
    obj = cNMF(output_dir=str(tmp_path), name="border",
               compute_dtype=np.float32)
    obj.prepare(counts_fn=counts_fn, components=[K], n_iter=8, seed=5,
                num_highvar_genes=100)
    obj.factorize(verbose=False)
    obj.combine()

    thresh = 0.30000001           # f32(thresh) > thresh
    assert float(np.float32(thresh)) > thresh
    n_rows = 8 * K
    dens = np.full(n_rows, 0.1)
    dens[3] = thresh - 1e-12      # host keeps; f32 rounds to >= f32(thresh)
    assert dens[3] < thresh
    assert np.float32(dens[3]) >= np.float32(thresh)
    from cnmf_tpu.io.dataframe import save_df_to_npz
    merged = load_df_from_npz(obj.paths["merged_spectra"] % K)
    save_df_to_npz(
        pd.DataFrame(dens, columns=["local_density"], index=merged.index),
        obj.paths["local_density_cache"] % K,
    )

    monkeypatch.setenv("CNMF_TPU_DEVICE_KMEANSPP", "force")
    obj.consensus(k=K, density_threshold=thresh, show_clustering=False)
    dt_tag = str(thresh).replace(".", "_")
    usages = load_df_from_npz(obj.paths["consensus_usages"] % (K, dt_tag))
    assert usages.shape == (n_cells, K)
    spectra = load_df_from_npz(obj.paths["consensus_spectra"] % (K, dt_tag))
    assert spectra.shape[0] == K
