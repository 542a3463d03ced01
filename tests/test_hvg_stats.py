"""Unit tests for the Fano-factor HVG selection (ops/stats.py), pinned
against an independent pandas re-derivation of the reference's math
(reference cnmf.py:136-188) including the NaN/inf edge cases."""

import numpy as np
import pandas as pd
import pytest

from cnmf_tpu.ops.stats import fano_hvg_stats


def _pandas_oracle(mean, var, numgenes=None, threshold=None, minimal_mean=0.5):
    """Straightforward pandas transcription of the selection contract."""
    m = pd.Series(mean)
    v = pd.Series(var)
    fano = v / m
    top = m.sort_values(ascending=False)[:20].index
    A = (np.sqrt(v) / m)[top].min()
    ml, mh = m.quantile([0.10, 0.90])
    fl, fh = fano.quantile([0.10, 0.90])
    box = (fano > fl) & (fano < fh) & (m > ml) & (m < mh)
    B = np.sqrt(fano[box].median())
    expected = A ** 2 * m + B ** 2
    ratio = fano / expected
    if numgenes is not None:
        chosen = ratio.sort_values(ascending=False).index[:numgenes]
        sel = ratio.index.isin(chosen)
        T = None
    else:
        T = threshold if threshold else 1.0 + fano[box].std()
        sel = (ratio > T) & (m > minimal_mean)
    return np.asarray(sel), float(A), float(B), T, np.asarray(expected)


@pytest.fixture
def stats_vectors():
    rng = np.random.RandomState(3)
    mean = rng.gamma(0.6, 30.0, size=500)
    # overdispersed tail + a few exactly-zero genes (NaN fano) + zero-var
    fano_true = 1.0 + rng.gamma(0.5, 2.0, size=500) * (rng.rand(500) < 0.3)
    var = mean * fano_true
    mean[::97] = 0.0
    var[::97] = 0.0
    var[5] = 0.0  # zero variance, positive mean
    return mean, var


def test_topn_selection_matches_oracle(stats_vectors):
    mean, var = stats_vectors
    stats, params = fano_hvg_stats(mean, var, numgenes=80)
    sel, A, B, _, expected = _pandas_oracle(mean, var, numgenes=80)
    assert stats.high_var.sum() == 80
    np.testing.assert_array_equal(stats.high_var.values, sel)
    assert params["A"] == pytest.approx(A, rel=1e-14)
    assert params["B"] == pytest.approx(B, rel=1e-14)
    np.testing.assert_allclose(stats.expected_fano.values, expected, rtol=1e-14)
    # zero-mean genes (NaN ratio) can never be selected
    assert not stats.high_var.values[::97].any()


def test_threshold_selection_matches_oracle(stats_vectors):
    mean, var = stats_vectors
    stats, params = fano_hvg_stats(mean, var)
    sel, _, _, T, _ = _pandas_oracle(mean, var)
    np.testing.assert_array_equal(stats.high_var.values, sel)
    assert params["T"] == pytest.approx(float(T), rel=1e-14)


def test_explicit_threshold_and_minimal_mean(stats_vectors):
    mean, var = stats_vectors
    stats, params = fano_hvg_stats(
        mean, var, expected_fano_threshold=1.5, minimal_mean=10.0
    )
    sel, *_ = _pandas_oracle(mean, var, threshold=1.5, minimal_mean=10.0)
    np.testing.assert_array_equal(stats.high_var.values, sel)
    assert params["T"] == 1.5
    assert (stats.loc[stats.high_var, "mean"] > 10.0).all()


def test_stats_frame_schema(stats_vectors):
    mean, var = stats_vectors
    stats, _ = fano_hvg_stats(mean, var, numgenes=50)
    assert list(stats.columns) == [
        "mean", "var", "fano", "expected_fano", "high_var", "fano_ratio"
    ]
    assert len(stats) == len(mean)
