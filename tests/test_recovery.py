"""Program-recovery test: the full pipeline on simulated data must recover
the planted expression programs — the functional ground-truth complement to
the sklearn-parity tests. Also exercises the KL/MU and nndsvd paths end to
end, which the parity tests only cover at the kernel level."""

import os

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu import cNMF, write_h5ad
from cnmf_tpu.simulate import simulate_counts


def best_match_correlations(found: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """For each true program, the max Pearson r against any found spectrum."""
    f = (found - found.mean(1, keepdims=True)) / (found.std(1, keepdims=True) + 1e-12)
    t = (truth - truth.mean(1, keepdims=True)) / (truth.std(1, keepdims=True) + 1e-12)
    corr = (t @ f.T) / found.shape[1]
    return corr.max(axis=1)


@pytest.mark.parametrize("beta_loss,init", [
    ("frobenius", "random"),
    ("kullback-leibler", "random"),
    ("frobenius", "nndsvd"),
])
def test_pipeline_recovers_planted_programs(tmp_path, beta_loss, init):
    adata, true_usage, true_spectra = simulate_counts(
        n_cells=400, n_genes=600, n_identities=5, n_activities=1,
        n_markers_per_program=40, seed=3,
    )
    counts_fn = str(tmp_path / "sim.h5ad")
    write_h5ad(counts_fn, adata)

    k = true_spectra.shape[0]
    name = f"rec_{beta_loss[:4]}_{init}"
    obj = cNMF(output_dir=str(tmp_path), name=name)
    obj.prepare(counts_fn=counts_fn, components=[k], n_iter=8, seed=14,
                num_highvar_genes=300, beta_loss=beta_loss, init=init,
                max_NMF_iter=400)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=k, density_threshold=2.0, show_clustering=False)

    _, scores, spectra_tpm, top_genes = obj.load_results(K=k, density_threshold=2.0)
    # compare recovered TPM-spectra to the truth on the HVG subset
    hvgs = open(obj.paths["nmf_genes_list"]).read().split("\n")
    found = spectra_tpm.loc[hvgs].T.values  # k × HVG
    truth = true_spectra[hvgs].values
    r = best_match_correlations(found, truth)
    assert (r > 0.75).sum() >= k - 1, f"recovered correlations: {np.round(r, 2)}"


def test_prepare_with_precomputed_tpm(tmp_path):
    """tpm_fn input path (reference cnmf.py:411-433): a user-provided TPM file
    is copied/round-tripped and drives HVG selection + tpm_stats."""
    adata, _, _ = simulate_counts(n_cells=150, n_genes=250, seed=4)
    counts_fn = str(tmp_path / "c.h5ad")
    write_h5ad(counts_fn, adata)

    from cnmf_tpu.ops.normalize import normalize_total
    from cnmf_tpu.io.anndata_lite import AnnData

    tpm = AnnData(normalize_total(adata.X, 1e6), obs=adata.obs.copy(),
                  var=adata.var.copy())
    tpm_fn = str(tmp_path / "tpm.h5ad")
    write_h5ad(tpm_fn, tpm)

    obj = cNMF(output_dir=str(tmp_path), name="tpmfn")
    obj.prepare(counts_fn=counts_fn, components=[4], n_iter=3, seed=1,
                num_highvar_genes=100, tpm_fn=tpm_fn)
    assert os.path.exists(obj.paths["tpm"])
    from cnmf_tpu.io.h5ad import read_h5ad

    back = read_h5ad(obj.paths["tpm"])
    np.testing.assert_allclose(
        np.asarray(back.X.sum(axis=1)).ravel(), 1e6, rtol=1e-6
    )


def test_simulator_properties():
    adata, usage, spectra = simulate_counts(n_cells=200, n_genes=300, seed=0)
    assert adata.shape == (200, 300)
    np.testing.assert_allclose(usage.sum(axis=1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(spectra.sum(axis=1), 1.0, rtol=1e-9)
    assert (adata.X >= 0).all()
    assert adata.obs["identity"].nunique() == 6
