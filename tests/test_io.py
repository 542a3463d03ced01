import os
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cnmf_tpu.io import (
    AnnData,
    load_df_from_npz,
    read_h5ad,
    save_df_to_npz,
    write_h5ad,
)
from cnmf_tpu.io.loaders import load_counts


def test_df_npz_roundtrip(tmp_path):
    df = pd.DataFrame(
        np.random.rand(5, 3),
        index=[f"cell{i}" for i in range(5)],
        columns=[f"gene{j}" for j in range(3)],
    )
    fn = str(tmp_path / "x.df.npz")
    save_df_to_npz(df, fn)
    df2 = load_df_from_npz(fn)
    np.testing.assert_allclose(df.values, df2.values)
    assert list(df.index) == list(df2.index)
    assert list(df.columns) == list(df2.columns)


@pytest.mark.parametrize("sparse", [False, True])
def test_h5ad_roundtrip(tmp_path, sparse):
    rng = np.random.RandomState(0)
    X = rng.binomial(20, 0.1, size=(30, 12)).astype(np.float32)
    if sparse:
        X = sp.csr_matrix(X)
    obs = pd.DataFrame(
        {"n_counts": np.arange(30, dtype=np.float64),
         "batch": pd.Categorical(["a", "b"] * 15)},
        index=pd.Index([f"c{i}" for i in range(30)]),
    )
    var = pd.DataFrame(index=pd.Index([f"g{i}" for i in range(12)]))
    adata = AnnData(X, obs=obs, var=var, uns={"norm": "tpm", "target": 1e6})
    fn = str(tmp_path / "x.h5ad")
    write_h5ad(fn, adata)
    back = read_h5ad(fn)
    Xd = X.toarray() if sparse else X
    Xb = back.X.toarray() if sp.issparse(back.X) else back.X
    np.testing.assert_allclose(Xd, Xb)
    assert list(back.obs.index) == list(obs.index)
    assert list(back.var.index) == list(var.index)
    np.testing.assert_allclose(back.obs["n_counts"].values, obs["n_counts"].values)
    assert list(back.obs["batch"]) == list(obs["batch"])
    assert back.uns["norm"] == "tpm"
    assert float(back.uns["target"]) == 1e6


def test_anndata_gene_subset():
    X = np.arange(24, dtype=np.float64).reshape(4, 6)
    var = pd.DataFrame(index=pd.Index([f"g{i}" for i in range(6)]))
    adata = AnnData(X, var=var)
    sub = adata[:, ["g3", "g1"]]
    np.testing.assert_allclose(sub.X, X[:, [3, 1]])
    assert list(sub.var_names) == ["g3", "g1"]

    adata_sp = AnnData(sp.csr_matrix(X), var=var)
    sub_sp = adata_sp[:, ["g3", "g1"]]
    np.testing.assert_allclose(sub_sp.X.toarray(), X[:, [3, 1]])


def test_load_counts_txt_and_npz(tmp_path):
    df = pd.DataFrame(
        np.random.RandomState(1).binomial(30, 0.2, size=(8, 5)),
        index=[f"c{i}" for i in range(8)],
        columns=[f"g{j}" for j in range(5)],
    )
    txt = str(tmp_path / "counts.txt")
    df.to_csv(txt, sep="\t")
    # DataFrame-sourced inputs stay dense (reference keeps them dense;
    # cnmf.py:383-402 — --densify only converts sparse the other way)
    adata = load_counts(txt)
    assert not sp.issparse(adata.X)
    np.testing.assert_allclose(adata.X, df.values)

    npz = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, npz)
    adata2 = load_counts(npz, densify=True)
    assert not sp.issparse(adata2.X)
    np.testing.assert_allclose(adata2.X, df.values)


def test_h5ad_legacy_format_read(tmp_path):
    """Pre-anndata-0.8 files: structured-record obs/var + h5sparse X."""
    import h5py

    rng = np.random.RandomState(2)
    X = sp.csr_matrix(rng.binomial(10, 0.2, size=(12, 7)).astype(np.float32))
    fn = str(tmp_path / "legacy.h5ad")
    with h5py.File(fn, "w") as f:
        g = f.create_group("X")
        g.attrs["h5sparse_format"] = "csr"
        g.attrs["h5sparse_shape"] = np.array(X.shape)
        g.create_dataset("data", data=X.data)
        g.create_dataset("indices", data=X.indices)
        g.create_dataset("indptr", data=X.indptr)
        obs_rec = np.array(
            [(f"c{i}".encode(), float(i)) for i in range(12)],
            dtype=[("index", "S8"), ("n_counts", "f8")],
        )
        f.create_dataset("obs", data=obs_rec)
        var_rec = np.array(
            [(f"g{j}".encode(),) for j in range(7)], dtype=[("index", "S8")]
        )
        f.create_dataset("var", data=var_rec)
    back = read_h5ad(fn)
    np.testing.assert_allclose(back.X.toarray(), X.toarray())
    assert list(back.obs.index) == [f"c{i}" for i in range(12)]
    np.testing.assert_allclose(back.obs["n_counts"].values, np.arange(12.0))
    assert list(back.var.index) == [f"g{j}" for j in range(7)]


def test_10x_mtx_roundtrip_through_prepare(tmp_path):
    """10x-formatted mtx directory input path (reference cnmf.py:385-387)."""
    import gzip
    import scipy.io

    rng = np.random.RandomState(6)
    n_cells, n_genes = 60, 80
    X = sp.csr_matrix(rng.binomial(30, 0.05, size=(n_cells, n_genes)).astype(float))
    X[np.asarray(X.sum(axis=1)).ravel() == 0, 0] = 1
    tenx = tmp_path / "mtx"
    tenx.mkdir()
    scipy.io.mmwrite(str(tenx / "matrix.mtx"), X.T.tocoo())  # 10x: genes x cells
    with gzip.open(str(tenx / "barcodes.tsv.gz"), "wt") as f:
        f.write("\n".join(f"BC{i}" for i in range(n_cells)))
    with gzip.open(str(tenx / "features.tsv.gz"), "wt") as f:
        f.write("\n".join(f"ENSG{j}\tSYM{j}\tGene Expression" for j in range(n_genes)))

    from cnmf_tpu.io.tenx import read_10x_mtx

    adata = read_10x_mtx(str(tenx))
    assert adata.shape == (n_cells, n_genes)
    assert list(adata.var.index[:2]) == ["SYM0", "SYM1"]
    np.testing.assert_allclose(adata.X.toarray(), X.toarray())

    from cnmf_tpu import cNMF

    obj = cNMF(output_dir=str(tmp_path), name="tenx")
    obj.prepare(counts_fn=str(tenx / "matrix.mtx"), components=[3], n_iter=2,
                seed=1, num_highvar_genes=40)
    assert os.path.exists(obj.paths["normalized_counts"])
