"""warmup() must cover the pipeline's program set: after priming, a
factorize → combine → consensus → k_selection_plot pass compiles NOTHING new
(persistent-cache misses == 0 — hits are fine, fresh XLA compiles are not).

The data shapes are deliberately odd (N=171, G=230, HVG=97, B=7) so no other
test's compiled programs can mask a coverage gap, and the K list spans both
pad buckets (5 → 8, 9 → 16). Drift between warmup's lowering arguments and
the runtime dispatch sites (statics, shapes, gates) shows up here as a
nonzero miss count naming the drifted program.
"""

import numpy as np
import pandas as pd

from cnmf_tpu import cNMF


class _MissCounter:
    def __init__(self):
        self.misses = 0
        self.hits = 0
        self.active = False

    def install(self):
        from jax._src import monitoring

        def on_event(event, **kw):
            if not self.active:
                return
            if event == "/jax/compilation_cache/cache_misses":
                self.misses += 1
            elif event == "/jax/compilation_cache/cache_hits":
                self.hits += 1

        monitoring.register_event_listener(on_event)
        return self


def test_warmup_covers_pipeline_programs(tmp_path):
    import jax

    # a FRESH persistent cache: against the repo-shared .jax_cache a prior
    # run's misses become this run's hits and coverage gaps go invisible
    prev_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cache"))
    try:
        _run_warmup_coverage(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)


def _run_warmup_coverage(tmp_path):
    rng = np.random.RandomState(23)
    W = rng.gamma(0.7, 1.0, size=(171, 6))
    H = rng.gamma(0.5, 1.0, size=(6, 230)) * (rng.rand(6, 230) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(171)],
                      columns=[f"g{j}" for j in range(230)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    counter = _MissCounter().install()
    obj = cNMF(output_dir=str(tmp_path), name="wu")
    obj.shard_cells = False  # single-device production path on the 8-dev CPU
    obj.prepare(counts_fn=fn, components=[5, 9], n_iter=7, seed=4,
                num_highvar_genes=97)

    done = obj.warmup(verbose=False)
    assert done, "warmup compiled nothing"
    failed = [k for k, v in done.items() if v < 0]
    assert not failed, f"warmup lowering failed for {failed}"

    counter.active = True
    obj.factorize(verbose=False, use_mesh=False)
    obj.combine()
    obj.consensus(k=5, density_threshold=0.5, show_clustering=False)
    obj.k_selection_plot(close_fig=True)
    counter.active = False
    assert counter.misses == 0, (
        f"warmed pipeline still compiled {counter.misses} program(s) "
        f"(hits={counter.hits}) — warmup coverage drifted"
    )


def test_warmup_lowers_chunk_sized_ladders(tmp_path, monkeypatch):
    """At atlas scale _factorize_one_k splits each K's restarts into
    HBM-bounded chunks; the warmup must lower the solver programs at those
    CHUNK sizes (body + tail), not the full per-K count, or the cold-start
    precompile misses exactly when the run is most expensive."""
    monkeypatch.setenv("CNMF_TPU_DEVICE_INIT", "force")
    monkeypatch.setenv("CNMF_TPU_DEVICE_LADDER", "1")

    rng = np.random.RandomState(3)
    X = rng.poisson(1.0, size=(60, 90)).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(60)],
                      columns=[f"g{j}" for j in range(90)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    obj = cNMF(output_dir=str(tmp_path), name="chunkwu")
    obj.prepare(counts_fn=fn, components=[5], n_iter=7, seed=4,
                num_highvar_genes=40)

    # virtual shape big enough that the 4 GB working-set bound forces
    # chunking: per_restart = N*pad_k*4*4 = 1.28e9 -> restart_chunk = 3,
    # so B=7 runs as chunks of 3, 3, 1 — mirror of _factorize_one_k's bound
    big_n = 10_000_000
    jobs = obj._warmup_jobs(norm_shape=(big_n, 90), tpm_meta=(90, False))
    labels = {j[1] for j in jobs}
    assert "seeded_ladder_pad8_B3" in labels, sorted(labels)
    assert "seeded_ladder_pad8_B1" in labels, sorted(labels)
    assert "seeded_ladder_pad8_B7" not in labels, sorted(labels)


def test_autowarm_sweep_noop_on_cpu_and_wired(tmp_path, monkeypatch):
    """_autowarm_sweep guards (CPU backend → no-op, never raises) and is
    invoked by k_selection_plot before the dispatch loop. The TPU-side
    compile coverage itself is pinned by test_warmup_covers_pipeline_programs
    (the k_stats jobs it AOT-compiles are the same _warmup_jobs entries)."""
    rng = np.random.RandomState(5)
    X = rng.poisson(1.0, size=(50, 80)).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(50)],
                      columns=[f"g{j}" for j in range(80)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    obj = cNMF(output_dir=str(tmp_path), name="aws")
    obj.prepare(counts_fn=fn, components=[4, 5], n_iter=3, seed=2,
                num_highvar_genes=40)
    obj.factorize(verbose=False, use_mesh=False)
    obj.combine()

    # the job filter selects exactly the per-K stats programs
    jobs = obj._warmup_jobs(norm_shape=(50, 40), tpm_meta=(80, False))
    kstat = [j for j in jobs if j[1].startswith("k_stats")]
    assert {j[1] for j in kstat} >= {"k_stats_k4", "k_stats_k5"}

    calls = []
    orig = obj._autowarm_sweep

    def spy(norm_shape):
        calls.append(norm_shape)
        return orig(norm_shape)  # CPU backend: must no-op without error

    monkeypatch.setattr(obj, "_autowarm_sweep", spy)
    obj.k_selection_plot(close_fig=True)
    assert calls == [(50, 40)]
