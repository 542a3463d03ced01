"""Per-gene statistics and high-variance gene (HVG) selection.

Implements the reference's Fano-factor overdispersion selection
(reference cnmf.py:136-242, both the sparse and dense twins share this single
code path) on plain mean/variance vectors, plus one-pass mean/var reductions
for dense (JAX, device) and sparse (numpy, host) matrices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import scipy.sparse as sp


def mean_var(X, ddof: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Per-column mean and variance, zeros included (StandardScaler semantics,
    reference cnmf.py:131-134)."""
    n = X.shape[0]
    if sp.issparse(X):
        # one pass over the nonzeros — X.multiply(X) would allocate a full
        # transient copy of the matrix
        Xc = X.tocsr() if not (sp.isspmatrix_csr(X) or sp.isspmatrix_csc(X)) else X
        moments = None
        if sp.isspmatrix_csr(Xc):
            from cnmf_tpu.native import csr_col_moments

            moments = csr_col_moments(Xc)  # threaded C++; None → numpy
        if moments is not None:
            colsum, colsq = moments
            mean = colsum / n
            sq = colsq / n
        else:
            if sp.isspmatrix_csr(Xc):
                cols = Xc.indices
            else:
                cols = np.repeat(np.arange(Xc.shape[1]), np.diff(Xc.indptr))
            g = X.shape[1]
            mean = np.bincount(cols, weights=Xc.data, minlength=g) / n
            sq = np.bincount(cols, weights=np.square(Xc.data), minlength=g) / n
        var = sq - mean**2
    else:
        X = np.asarray(X)
        mean = X.mean(axis=0)
        var = X.var(axis=0, ddof=0)
    if ddof:
        var = var * n / (n - ddof)
    return mean.astype(np.float64), var.astype(np.float64)




def fano_hvg_stats(
    gene_mean: np.ndarray,
    gene_var: np.ndarray,
    expected_fano_threshold: Optional[float] = None,
    minimal_mean: float = 0.5,
    numgenes: Optional[int] = None,
) -> Tuple[pd.DataFrame, dict]:
    """Fano-factor HVG selection given per-gene mean/var of the TPM matrix.

    The expected-fano line ``A²·mean + B²`` is fit from the top-20-mean genes
    (A) and the winsor-box median fano (B); genes are ranked by
    fano/expected_fano. With ``numgenes`` set, the top-N ranked genes are
    selected; otherwise a threshold ``T = 1 + std(fano in box)`` plus a
    minimum-mean filter applies (reference cnmf.py:136-188).
    """
    gene_mean = pd.Series(np.asarray(gene_mean, dtype=np.float64))
    gene_var = pd.Series(np.asarray(gene_var, dtype=np.float64))
    gene_fano = gene_var / gene_mean

    top_genes = gene_mean.sort_values(ascending=False)[:20].index
    A = (np.sqrt(gene_var) / gene_mean)[top_genes].min()

    w_mean_low, w_mean_high = gene_mean.quantile([0.10, 0.90])
    w_fano_low, w_fano_high = gene_fano.quantile([0.10, 0.90])
    winsor_box = (
        (gene_fano > w_fano_low)
        & (gene_fano < w_fano_high)
        & (gene_mean > w_mean_low)
        & (gene_mean < w_mean_high)
    )
    fano_median = gene_fano[winsor_box].median()
    B = np.sqrt(fano_median)

    gene_expected_fano = (A**2) * gene_mean + (B**2)
    fano_ratio = gene_fano / gene_expected_fano

    if numgenes is not None:
        highvargenes = fano_ratio.sort_values(ascending=False).index[:numgenes]
        high_var_genes_ind = fano_ratio.index.isin(highvargenes)
        T = None
    else:
        if not expected_fano_threshold:
            T = 1.0 + gene_fano[winsor_box].std()
        else:
            T = expected_fano_threshold
        high_var_genes_ind = (fano_ratio > T) & (gene_mean > minimal_mean)

    gene_counts_stats = pd.DataFrame(
        {
            "mean": gene_mean,
            "var": gene_var,
            "fano": gene_fano,
            "expected_fano": gene_expected_fano,
            "high_var": high_var_genes_ind,
            "fano_ratio": fano_ratio,
        }
    )
    gene_fano_parameters = {"A": A, "B": B, "T": T, "minimal_mean": minimal_mean}
    return gene_counts_stats, gene_fano_parameters


def get_highvar_genes(tpm_X, numgenes: Optional[int] = None,
                      expected_fano_threshold: Optional[float] = None,
                      minimal_mean: float = 0.5):
    """HVG selection from a TPM matrix (sparse or dense)."""
    mean, var = mean_var(tpm_X, ddof=0)
    return fano_hvg_stats(
        mean, var,
        expected_fano_threshold=expected_fano_threshold,
        minimal_mean=minimal_mean,
        numgenes=numgenes,
    )
