"""seurat_v3 HVG margin-stability evidence.

scikit-misc (the loess scanpy's seurat_v3 flavor wraps) is unreachable in
this environment, so an exact comparison is impossible; these tests instead
quantify the risk its absence creates: how much the top-N HVG SELECTION
moves when the loess regularization is perturbed the ways skmisc's
implementation differs from ours — surface interpolation from anchor
vertices (skmisc's default cell-based approximation) instead of exact
per-point fits, and span variation. If the selection is stable at the
margin, an own-brand loess cannot silently change which genes enter the
factorization (reference preprocess.py:314-315 semantics).

Also pins the vectorized loess_fit against a brute-force per-point oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from cnmf_tpu.ops.hvg_seurat import highly_variable_genes_seurat_v3, loess_fit


def _nb_counts(n_cells=800, n_genes=8000, seed=0):
    """Negative-binomial scRNA-like counts: log-normal mean ladder plus a
    dispersed overdispersion spectrum — the regime the loess regularizes."""
    rng = np.random.RandomState(seed)
    mu = np.exp(rng.normal(-1.0, 2.0, size=n_genes)).clip(1e-3, 50.0)
    theta = np.exp(rng.normal(0.5, 1.0, size=n_genes)).clip(0.05, 50.0)
    lam = rng.gamma(theta[None, :], (mu / theta)[None, :],
                    size=(n_cells, n_genes))
    X = rng.poisson(lam).astype(np.float64)
    X[:, X.sum(axis=0) == 0] = 0  # keep zero columns zero (const genes)
    return sp.csr_matrix(X)


def _loess_oracle(x, y, span=0.3, degree=2):
    """Brute-force per-point tricube-weighted polynomial regression."""
    n = len(x)
    q = max(int(np.floor(span * n)), degree + 1)
    fitted = np.empty(n)
    for i in range(n):
        d = np.abs(x - x[i])
        nearest = np.argsort(d, kind="stable")[:q]
        dmax = d[nearest].max() or 1.0
        w = np.maximum((1 - (d[nearest] / dmax) ** 3) ** 3, 0.0)
        t = x[nearest] - x[i]
        A = np.vander(t, degree + 1, increasing=True)
        G = (A * w[:, None]).T @ A
        b = (A * w[:, None]).T @ y[nearest]
        fitted[i] = np.linalg.lstsq(G, b, rcond=None)[0][0]
    return fitted


def _interpolated_loess(x, y, span=0.3, n_anchors=200):
    """skmisc-style surface approximation: exact fits at anchor vertices,
    linear interpolation in between."""
    order = np.argsort(x, kind="stable")
    xs = x[order]
    anchor_pos = np.unique(
        np.linspace(0, len(xs) - 1, n_anchors).round().astype(int)
    )
    anchors = xs[anchor_pos]
    exact = loess_fit(x, y, span=span)
    fitted_sorted = np.interp(xs, anchors, exact[order][anchor_pos])
    out = np.empty_like(fitted_sorted)
    out[order] = fitted_sorted
    return out


def _select_with_loess(X, loess_values, n_top):
    """Re-run the selection tail with a substituted loess fit."""
    N = X.shape[0]
    mean = np.asarray(X.mean(axis=0)).ravel()
    sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
    var = (sq - mean ** 2) * N / (N - 1)
    not_const = var > 0
    reg_std = np.zeros(X.shape[1])
    reg_std[not_const] = np.sqrt(10 ** loess_values)
    clip_val = mean + np.sqrt(N) * reg_std
    Xc = X.tocsc()
    gene_of_nz = np.repeat(np.arange(X.shape[1]), np.diff(Xc.indptr))
    clipped = np.minimum(Xc.data, clip_val[gene_of_nz])
    sq_sum = np.bincount(gene_of_nz, weights=clipped ** 2, minlength=X.shape[1])
    cl_sum = np.bincount(gene_of_nz, weights=clipped, minlength=X.shape[1])
    nv = np.zeros(X.shape[1])
    denom = (N - 1) * np.square(reg_std)
    ok = not_const & (denom > 0)
    nv[ok] = (N * mean[ok] ** 2 + sq_sum[ok] - 2 * cl_sum[ok] * mean[ok]) / denom[ok]
    ranked = np.argsort(-nv, kind="stable")
    mask = np.zeros(X.shape[1], dtype=bool)
    mask[ranked[:n_top]] = True
    return mask


def test_loess_fit_matches_bruteforce_oracle():
    rng = np.random.RandomState(2)
    x = np.sort(rng.uniform(-2, 2, 600)) + rng.normal(0, 1e-6, 600)
    y = np.sin(x) * 2 + 0.3 * x ** 2 + rng.normal(0, 0.1, 600)
    ours = loess_fit(x, y, span=0.3)
    oracle = _loess_oracle(x, y, span=0.3)
    # windows may differ by one neighbor at exact-distance ties; fits agree
    np.testing.assert_allclose(ours, oracle, atol=5e-3)
    assert np.abs(ours - oracle).mean() < 2e-4


@pytest.mark.parametrize("n_top", [1000, 2000])
def test_selection_stable_under_surface_interpolation(n_top):
    """The selection must not care whether the loess is evaluated exactly
    per gene or interpolated from ~200 anchors (skmisc's surface mode)."""
    X = _nb_counts()
    mask_exact, _ = highly_variable_genes_seurat_v3(X, n_top_genes=n_top)

    N = X.shape[0]
    mean = np.asarray(X.mean(axis=0)).ravel()
    sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
    var = (sq - mean ** 2) * N / (N - 1)
    not_const = var > 0
    x = np.log10(mean[not_const])
    y = np.log10(var[not_const])

    interp = np.zeros(X.shape[1])
    interp[not_const] = _interpolated_loess(x, y)
    mask_interp = _select_with_loess(X, interp[not_const], n_top)
    # note: _select_with_loess fills reg_std only where not_const
    overlap = (mask_exact & mask_interp).sum() / n_top
    assert overlap >= 0.99, f"surface-interpolated overlap {overlap:.4f}"


def test_selection_stable_under_span_jitter():
    """±0.05 span (a bigger perturbation than any implementation detail)
    moves at most ~2% of the top-2000 set."""
    X = _nb_counts(seed=3)
    n_top = 2000
    N = X.shape[0]
    mean = np.asarray(X.mean(axis=0)).ravel()
    sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
    var = (sq - mean ** 2) * N / (N - 1)
    not_const = var > 0
    x = np.log10(mean[not_const])
    y = np.log10(var[not_const])

    masks = {}
    for span in (0.25, 0.30, 0.35):
        fit = loess_fit(x, y, span=span)
        masks[span] = _select_with_loess(X, fit, n_top)
    for span in (0.25, 0.35):
        overlap = (masks[0.30] & masks[span]).sum() / n_top
        assert overlap >= 0.98, f"span {span} overlap {overlap:.4f}"
