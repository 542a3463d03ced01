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
    # integer-image inputs may take the compact expand-on-device path
    # (ops/device_tpm): f32(count)·f32(scale) vs the host's
    # f32(f64 count · f64 scale) — equal to <=2 ulp; the float-upload path
    # is bit-identical and also passes this
    np.testing.assert_allclose(dev[: host.shape[0]], host, rtol=3e-7, atol=0)
    # and consensus completes using it
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)


def test_prefetch_compact_sharded_on_mesh(tmp_path, monkeypatch):
    """Round 4: the compact integer-image TPM prefetch applies on a
    multi-device host too — the image ships cell-SHARDED (put_cells layout,
    zero pad rows) and expands on device, so the mesh path keeps the 2-4x
    link-byte win instead of falling back to the float upload."""
    import pandas as pd

    import jax

    monkeypatch.setenv("CNMF_TPU_PREFETCH_TPM", "1")
    rng = np.random.RandomState(4)
    X = rng.poisson(1.5, size=(130, 220)).astype(np.int64)  # dense ints
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(130)],
                      columns=[f"g{j}" for j in range(220)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="pf_mesh")
    obj.prepare(counts_fn=fn, components=[4], n_iter=6, seed=14,
                num_highvar_genes=90)
    assert getattr(obj, "_tpm_compact", None) is not None
    obj.factorize(verbose=False)
    obj._join_tpm_prefetch()
    cached = getattr(obj, "_tpm_dev_cache", None)
    assert cached is not None, "compact prefetch did not seed the cache"
    dev = cached[1]
    n_dev = len(jax.devices())
    if n_dev > 1:
        # padded to the device multiple and actually sharded over cells
        assert dev.shape[0] == -(-130 // n_dev) * n_dev
        assert len(dev.sharding.device_set) == n_dev
    tpm = obj._read_h5ad_cached(obj.paths["tpm"])
    host = densify_csr(tpm.X, out_dtype=obj.compute_dtype)
    np.testing.assert_allclose(
        np.asarray(dev)[:130], host, rtol=3e-7, atol=0
    )
    assert not np.asarray(dev)[130:].any()
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)


def test_prefetch_disabled_leaves_no_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_PREFETCH_TPM", "0")
    obj = _prepared(tmp_path, "pf_off")
    obj.factorize(verbose=False)
    obj._join_tpm_prefetch()
    assert getattr(obj, "_tpm_dev_cache", None) is None
