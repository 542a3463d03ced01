"""Minimal scanpy stand-in so the REFERENCE implementation can execute here.

The reference (/root/reference/src/cnmf/cnmf.py) needs exactly six scanpy
symbols: ``read``, ``write``, ``AnnData``, ``read_10x_mtx``,
``pp.normalize_total`` and ``pp.scale`` (reference cnmf.py:250, 384-433,
538, 726, 873, 950, 967). This image ships no scanpy, which is the only
missing dependency between the reference and a live A/B — so the A/B test
(tests/test_reference_ab.py) puts this module on sys.path as ``scanpy``.

The reference Preprocess layer (reference preprocess.py) additionally uses
``pp.filter_genes`` / ``pp.filter_cells`` (and normalize_total's ``copy``
kwarg) on its harmony-free paths — provided below so
tests/test_reference_ab_preprocess.py can A/B filter_adata and
preprocess_for_cnmf live (the seurat_v3-HVG and harmonypy calls still need
packages this environment cannot install; those paths are covered by the
independent oracles instead).

Scope rules:
* IO (read/write/AnnData) reuses cnmf_tpu's h5ad codec and container — the
  IO layer is contract plumbing, pinned by its own round-trip tests, and
  both pipelines must read the same files anyway.
* The MATH (normalize_total, scale) is implemented HERE on raw
  numpy/scipy/sklearn with scanpy's documented semantics — deliberately NOT
  via cnmf_tpu.ops — so the reference pipeline's numerics stay independent
  of the code under test.
"""

import numpy as np
import scipy.sparse as sp

from cnmf_tpu.io.anndata_lite import AnnData  # noqa: F401  (sc.AnnData)
from cnmf_tpu.io.h5ad import read_h5ad, write_h5ad


def read(filename):
    return read_h5ad(str(filename))


def write(filename, adata):
    write_h5ad(str(filename), adata)


def read_10x_mtx(path):  # pragma: no cover - not used by the A/B harness
    raise NotImplementedError("reference shim: 10x input not needed for A/B")


class pp:
    """scanpy.pp subset (scanpy's normalize_total / scale semantics)."""

    @staticmethod
    def normalize_total(adata, target_sum=None, copy=False):
        if copy:
            adata = adata.copy()
        X = adata.X
        if not sp.issparse(X) and X.dtype.kind != "f":
            X = X.astype(np.float64)
        counts = np.asarray(X.sum(axis=1)).ravel().astype(np.float64)
        if target_sum is None:
            target_sum = np.median(counts[counts > 0])
        scale = counts / target_sum
        scale[scale == 0] = 1.0
        if sp.issparse(X):
            from sklearn.utils import sparsefuncs

            if X.dtype.kind != "f":
                X = X.astype(np.float64)
            sparsefuncs.inplace_row_scale(X, 1.0 / scale)
            adata.X = X
        else:
            adata.X = X / scale[:, None]
        return adata if copy else None

    @staticmethod
    def filter_genes(adata, min_cells=None):
        """scanpy.pp.filter_genes(min_cells=) semantics: keep genes detected
        (nonzero) in >= min_cells cells, record var['n_cells'], subset the
        AnnData IN PLACE (the reference calls it for its side effect,
        reference preprocess.py:92)."""
        X = adata.X
        n_cells = np.asarray((X != 0).sum(axis=0)).ravel()
        keep = n_cells >= min_cells
        adata.X = X[:, np.where(keep)[0]] if not sp.issparse(X) \
            else X.tocsc()[:, np.where(keep)[0]].tocsr()
        adata.var = adata.var.loc[keep].copy()
        adata.var["n_cells"] = n_cells[keep]

    @staticmethod
    def filter_cells(adata, min_counts=None):
        """scanpy.pp.filter_cells(min_counts=) semantics: keep cells with
        total counts >= min_counts, record obs['n_counts'], subset IN PLACE
        (reference preprocess.py:105)."""
        X = adata.X
        n_counts = np.asarray(X.sum(axis=1)).ravel()
        keep = n_counts >= min_counts
        adata.X = X[np.where(keep)[0]]
        adata.obs = adata.obs.loc[keep].copy()
        adata.obs["n_counts"] = n_counts[keep]

    @staticmethod
    def scale(adata, zero_center=True, max_value=None):
        X = adata.X
        n = X.shape[0]
        if sp.issparse(X):
            if zero_center:
                raise NotImplementedError(
                    "reference shim: zero_center scale densifies; the "
                    "reference only calls zero_center=False on sparse X"
                )
            mean = np.asarray(X.mean(axis=0)).ravel()
            sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
            var = (sq - mean ** 2) * (n / (n - 1))
            std = np.sqrt(var)
            std[std == 0] = 1.0
            from sklearn.utils import sparsefuncs

            sparsefuncs.inplace_column_scale(X, 1.0 / std)
        else:
            X = np.asarray(X, dtype=np.float64)
            std = X.std(axis=0, ddof=1)
            std[std == 0] = 1.0
            if zero_center:
                X = X - X.mean(axis=0)
            X = X / std
            adata.X = X
        if max_value is not None:
            if sp.issparse(adata.X):
                adata.X.data[adata.X.data > max_value] = max_value
            else:
                np.clip(adata.X, None, max_value, out=adata.X)
