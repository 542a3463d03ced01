"""Input-format matrix test for prepare (mirrors reference tests/test_prepare.py:
synthetic binomial counts written as txt / df.npz / h5ad × dtypes × densify,
asserting the six prepare-stage artifacts land)."""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cnmf_tpu import AnnData, cNMF, save_df_to_npz, write_h5ad

NUM_CELLS = 100
NUM_GENES = 500


@pytest.fixture(scope="module")
def counts_df():
    np.random.seed(42)
    counts = np.random.binomial(100, 0.01, size=(NUM_CELLS, NUM_GENES))
    return pd.DataFrame(
        counts,
        index=[f"cell_{i}" for i in range(NUM_CELLS)],
        columns=[f"gene_{j}" for j in range(NUM_GENES)],
    )


def write_input(counts_df, path, fmt, dtype):
    df = counts_df.astype(dtype)
    if fmt == "txt":
        fn = os.path.join(path, "counts.txt")
        df.to_csv(fn, sep="\t")
    elif fmt == "npz":
        fn = os.path.join(path, "counts.df.npz")
        save_df_to_npz(df, fn)
    else:
        fn = os.path.join(path, "counts.h5ad")
        adata = AnnData(
            sp.csr_matrix(df.values),
            obs=pd.DataFrame(index=df.index),
            var=pd.DataFrame(index=df.columns),
        )
        write_h5ad(fn, adata)
    return fn


@pytest.mark.parametrize("fmt", ["txt", "npz", "h5ad"])
@pytest.mark.parametrize("dtype", [np.int64, np.float32, np.float64])
@pytest.mark.parametrize("densify", [False, True])
def test_prepare_formats(tmp_path, counts_df, fmt, dtype, densify):
    fn = write_input(counts_df, str(tmp_path), fmt, dtype)
    obj = cNMF(output_dir=str(tmp_path), name=f"run_{fmt}_{np.dtype(dtype).name}_{densify}")
    obj.prepare(counts_fn=fn, components=[5], n_iter=2, seed=42,
                num_highvar_genes=100, densify=densify)
    for key in ["normalized_counts", "nmf_replicate_parameters",
                "nmf_run_parameters", "nmf_genes_list", "tpm", "tpm_stats"]:
        assert os.path.exists(obj.paths[key]), key


def test_prepare_zero_cell_raises(tmp_path, counts_df):
    df = counts_df.copy()
    df.iloc[3, :] = 0
    fn = os.path.join(str(tmp_path), "zero.txt")
    df.to_csv(fn, sep="\t")
    obj = cNMF(output_dir=str(tmp_path), name="zero")
    with pytest.raises(Exception, match="zero counts of overdispersed genes"):
        obj.prepare(counts_fn=fn, components=[5], n_iter=2, seed=42,
                    num_highvar_genes=100)


def test_prepare_replicate_params_deterministic(tmp_path, counts_df):
    """Seeds are order-stable and independent of worker count (SURVEY §2.10)."""
    from cnmf_tpu.io.dataframe import load_df_from_npz

    fn = write_input(counts_df, str(tmp_path), "npz", np.float64)
    obj1 = cNMF(output_dir=str(tmp_path), name="det1")
    obj1.prepare(counts_fn=fn, components=[5, 7], n_iter=3, seed=10, num_highvar_genes=80)
    obj2 = cNMF(output_dir=str(tmp_path), name="det2")
    obj2.prepare(counts_fn=fn, components=[7, 5], n_iter=3, seed=10, num_highvar_genes=80)
    p1 = load_df_from_npz(obj1.paths["nmf_replicate_parameters"])
    p2 = load_df_from_npz(obj2.paths["nmf_replicate_parameters"])
    pd.testing.assert_frame_equal(
        p1[["n_components", "iter", "nmf_seed"]],
        p2[["n_components", "iter", "nmf_seed"]],
    )


def test_prepare_hvg_gene_list_used(tmp_path, counts_df):
    fn = write_input(counts_df, str(tmp_path), "txt", np.float64)
    genes = list(counts_df.columns[50:130])
    genes_file = os.path.join(str(tmp_path), "genes.txt")
    with open(genes_file, "w") as f:
        f.write("\n".join(genes))
    obj = cNMF(output_dir=str(tmp_path), name="geneslist")
    obj.prepare(counts_fn=fn, components=[4], n_iter=2, seed=3,
                genes_file=genes_file)
    saved = open(obj.paths["nmf_genes_list"]).read().split("\n")
    assert saved == genes
    from cnmf_tpu.io.h5ad import read_h5ad
    norm = read_h5ad(obj.paths["normalized_counts"])
    assert list(norm.var.index) == genes


def test_prepare_store_dtype_knob(tmp_path, counts_df, monkeypatch):
    """CNMF_TPU_PREPARE_DTYPE=float32 halves the prepare h5ad bytes; the
    end-to-end consensus artifacts stay within f32 rounding of the default
    f64 on-disk contract (stats are computed BEFORE the storage cast)."""
    from cnmf_tpu.io.dataframe import load_df_from_npz
    from cnmf_tpu.io.h5ad import read_h5ad

    fn = write_input(counts_df, str(tmp_path), "h5ad", np.float64)

    def run(name):
        obj = cNMF(output_dir=str(tmp_path), name=name)
        obj.prepare(counts_fn=fn, components=[4], n_iter=4, seed=14,
                    num_highvar_genes=90)
        obj.factorize(verbose=False)
        obj.combine()
        obj.consensus(k=4, density_threshold=0.5, show_clustering=False)
        return obj

    ref = run("store_f64")
    monkeypatch.setenv("CNMF_TPU_PREPARE_DTYPE", "float32")
    f32 = run("store_f32")

    assert read_h5ad(f32.paths["tpm"]).X.dtype == np.float32
    assert read_h5ad(f32.paths["normalized_counts"]).X.dtype == np.float32
    # sparse CSR: data bytes halve (8->4 per nnz) while the int32 indices
    # stay — 2/3 asymptotically, plus fixed h5 overhead at this tiny size
    assert (os.path.getsize(f32.paths["normalized_counts"])
            < 0.8 * os.path.getsize(ref.paths["normalized_counts"]))
    # tpm_stats computed at input precision, before the cast
    a = load_df_from_npz(ref.paths["tpm_stats"])
    b = load_df_from_npz(f32.paths["tpm_stats"])
    np.testing.assert_allclose(a.values, b.values, rtol=1e-12)
    for key in ["consensus_spectra", "consensus_usages", "gene_spectra_tpm"]:
        x = load_df_from_npz(ref.paths[key] % (4, "0_5")).values
        y = load_df_from_npz(f32.paths[key] % (4, "0_5")).values
        rel = np.abs(x - y).max() / max(np.abs(x).max(), 1e-12)
        assert rel < 1e-4, (key, rel)
