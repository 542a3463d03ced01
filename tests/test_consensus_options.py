"""Consensus option paths: normalize_tpm_spectra, refit_usage=False, cached
density reuse across thresholds, KL/MU solver configuration end-to-end."""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("copts")
    rng = np.random.RandomState(5)
    W = rng.gamma(0.7, 1.0, size=(180, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 220)) * (rng.rand(5, 220) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(180)],
                      columns=[f"g{j}" for j in range(220)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="copts")
    obj.prepare(counts_fn=fn, components=[5], n_iter=6, seed=7,
                num_highvar_genes=120)
    obj.factorize(verbose=False)
    obj.combine()
    return obj


def test_normalize_tpm_spectra(run):
    run.consensus(k=5, density_threshold=2.0, show_clustering=False,
                  normalize_tpm_spectra=True)
    tpm_spec = load_df_from_npz(run.paths["gene_spectra_tpm"] % (5, "2_0"))
    np.testing.assert_allclose(tpm_spec.sum(axis=1), 1e6, rtol=1e-4)


def test_refit_usage_false_keeps_first_fit(run):
    run.consensus(k=5, density_threshold=1.9, show_clustering=False,
                  refit_usage=False)
    usages = load_df_from_npz(run.paths["consensus_usages"] % (5, "1_9"))
    spectra = load_df_from_npz(run.paths["consensus_spectra"] % (5, "1_9"))
    # without the final refit, usages are the NNLS fit of norm counts on the
    # median spectra (columns 1..k, reordered by total usage)
    assert list(usages.columns) == list(range(1, 6))
    assert usages.shape == (180, 5) and spectra.shape[0] == 5


def test_density_cache_reused_across_thresholds(run):
    cache_fn = run.paths["local_density_cache"] % 5
    assert os.path.exists(cache_fn)
    mtime = os.path.getmtime(cache_fn)
    run.consensus(k=5, density_threshold=1.5, show_clustering=False)
    assert os.path.getmtime(cache_fn) == mtime  # reused, not recomputed


def test_consensus_stats_records_threshold(run):
    stats = run.consensus(k=5, density_threshold=0.7,
                          skip_density_and_return_after_stats=True,
                          show_clustering=False)
    assert float(stats.loc["k"].iloc[0]) == 5
    assert float(stats.loc["local_density_threshold"].iloc[0]) == 0.7
    assert np.isfinite(float(stats.loc["silhouette"].iloc[0]))
    assert float(stats.loc["prediction_error"].iloc[0]) > 0


def test_fused_matches_unfused_consensus(run, monkeypatch, tmp_path):
    """The single-program fused consensus and the step-by-step path must
    produce the same artifacts (f64, tight tolerance) — every consensus
    file plus the clustergram-facing labels."""
    artifacts = ["consensus_spectra", "consensus_usages",
                 "gene_spectra_tpm", "gene_spectra_score"]
    results = {}
    for mode, flag in [("fused", "1"), ("unfused", "0")]:
        monkeypatch.setenv("CNMF_TPU_FUSED_CONSENSUS", flag)
        obj = cNMF(output_dir=run.output_dir, name="copts",
                   compute_dtype=np.float64)
        obj.consensus(k=5, density_threshold=1.7, show_clustering=False,
                      build_ref=False)
        results[mode] = {
            key: load_df_from_npz(obj.paths[key] % (5, "1_7"))
            for key in artifacts
        }
    for key in artifacts:
        a, b = results["fused"][key], results["unfused"][key]
        assert list(a.index) == list(b.index), key
        scale = max(float(np.abs(b.values).max()), 1e-12)
        np.testing.assert_allclose(a.values, b.values, rtol=1e-6,
                                   atol=1e-8 * scale, err_msg=key)


def test_atlas_host_fallback_matches_device_path(run):
    """Forcing the >4GB-TPM host fallback (gene-chunked NNLS + row-batched
    OLS) must reproduce the device path's artifacts."""
    from cnmf_tpu.io.h5ad import read_h5ad  # noqa: F401

    device_tpm = load_df_from_npz(run.paths["gene_spectra_tpm"] % (5, "1_9"))
    device_score = load_df_from_npz(run.paths["gene_spectra_score"] % (5, "1_9"))

    run.tpm_device_bytes_limit = 1  # force the fallback branch
    try:
        run.consensus(k=5, density_threshold=1.9, show_clustering=False,
                      refit_usage=False)
    finally:
        del run.tpm_device_bytes_limit

    fb_tpm = load_df_from_npz(run.paths["gene_spectra_tpm"] % (5, "1_9"))
    fb_score = load_df_from_npz(run.paths["gene_spectra_score"] % (5, "1_9"))
    scale = float((device_tpm.values ** 2).sum())
    assert ((fb_tpm.values - device_tpm.values) ** 2).sum() / scale < 1e-6
    scale = float((device_score.values ** 2).sum())
    assert ((fb_score.values - device_score.values) ** 2).sum() / scale < 1e-6
