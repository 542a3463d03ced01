"""The factorize-launched TPM prefetch must seed exactly the device buffer
consensus would otherwise build itself, and stay silent when disabled."""

import numpy as np

from cnmf_tpu import cNMF, write_h5ad
from cnmf_tpu.native import densify_csr
from cnmf_tpu.simulate import simulate_counts


def _prepared(tmp_path, name):
    adata, _, _ = simulate_counts(
        n_cells=120, n_genes=200, n_identities=4, n_activities=0,
        n_markers_per_program=20, seed=9,
    )
    counts_fn = str(tmp_path / "sim.h5ad")
    write_h5ad(counts_fn, adata)
    obj = cNMF(output_dir=str(tmp_path), name=name)
    obj.prepare(counts_fn=counts_fn, components=[4], n_iter=8, seed=14,
                num_highvar_genes=80)
    return obj


def test_prefetch_seeds_the_consensus_tpm_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_PREFETCH_TPM", "1")
    obj = _prepared(tmp_path, "pf_on")
    obj.factorize(verbose=False)
    obj._join_tpm_prefetch()
    cached = getattr(obj, "_tpm_dev_cache", None)
    assert cached is not None, "prefetch did not populate the device cache"
    tpm = obj._read_h5ad_cached(obj.paths["tpm"])
    assert cached[0]() is tpm, "cache keyed to a different host object"
    dev = np.asarray(cached[1])
    host = densify_csr(tpm.X, out_dtype=obj.compute_dtype)
    np.testing.assert_array_equal(dev[: host.shape[0]], host)
    # and consensus completes using it
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)


def test_prefetch_disabled_leaves_no_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_PREFETCH_TPM", "0")
    obj = _prepared(tmp_path, "pf_off")
    obj.factorize(verbose=False)
    obj._join_tpm_prefetch()
    assert getattr(obj, "_tpm_dev_cache", None) is None
