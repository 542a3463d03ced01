"""Tail-compacted grid scheduler (ops.nmf.nmf_cd_grid) parity.

The merged schedule must reproduce the plain per-K batched solver exactly:
frozen restarts never update, batch position enters no per-restart reduction,
and ladder padding slots start done. The pipeline-level A/B pins the
factorize() integration (CNMF_TPU_GRID) end to end.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from cnmf_tpu.ops.nmf import _ladder, nmf_cd_grid, nmf_coordinate_descent


def _mk(B, N, G, K, pad_k, seed):
    rng = np.random.RandomState(seed)
    W0 = np.abs(rng.standard_normal((B, N, K))).astype(np.float32)
    Ht0 = np.abs(rng.standard_normal((B, G, K))).astype(np.float32)
    W0 = np.pad(W0, ((0, 0), (0, 0), (0, pad_k - K)))
    Ht0 = np.pad(Ht0, ((0, 0), (0, 0), (0, pad_k - K)))
    return W0, Ht0


def test_ladder_shapes():
    assert _ladder(500, 32) == [504, 256, 128, 64, 32]
    assert _ladder(400, 32) == [400, 200, 104, 56, 32]
    assert _ladder(24, 32) == [24]
    assert all(s % 8 == 0 for s in _ladder(1000, 32))


@pytest.mark.parametrize("seg_len,max_iter", [(10, 95), (25, 100)])
def test_grid_matches_plain_solver_merged_ks(seg_len, max_iter):
    # three K values share the pad-8 bucket; different convergence speeds
    rng = np.random.RandomState(0)
    N, G = 60, 40
    X = np.abs(rng.standard_normal((N, G))).astype(np.float32)
    Xd = jnp.asarray(X)

    pad_k = 8
    merged_W, merged_Ht, plain_spec, plain_n = [], [], [], []
    for i, k in enumerate([5, 6, 7]):
        W0, Ht0 = _mk(8, N, G, k, pad_k, seed=i)
        merged_W.append(W0)
        merged_Ht.append(Ht0)
        _, Ht, n = nmf_coordinate_descent(
            Xd, jnp.asarray(W0), jnp.asarray(Ht0),
            tol=1e-3, max_iter=max_iter,
        )
        plain_spec.append(np.swapaxes(np.asarray(Ht), 1, 2))
        plain_n.append(np.asarray(n))

    spec, n_iter = nmf_cd_grid(
        Xd, jnp.asarray(np.concatenate(merged_W)),
        jnp.asarray(np.concatenate(merged_Ht)),
        tol=1e-3, max_iter=max_iter, seg_len=seg_len, min_bucket=8,
    )
    ref_spec = np.concatenate(plain_spec)
    ref_n = np.concatenate(plain_n)
    np.testing.assert_array_equal(n_iter, ref_n)
    np.testing.assert_allclose(spec, ref_spec, rtol=0, atol=2e-6)
    # convergence really is heterogeneous (the scenario the grid targets)
    assert ref_n.min() < ref_n.max()


def test_grid_single_ladder_level():
    # batch too small to shrink: degenerates to the plain solver
    rng = np.random.RandomState(3)
    X = np.abs(rng.standard_normal((30, 20))).astype(np.float32)
    W0, Ht0 = _mk(4, 30, 20, 4, 8, seed=9)
    _, Ht, n = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-4, max_iter=40,
    )
    spec, n_iter = nmf_cd_grid(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-4, max_iter=40, seg_len=15, min_bucket=32,
    )
    np.testing.assert_array_equal(n_iter, np.asarray(n))
    np.testing.assert_allclose(
        spec, np.swapaxes(np.asarray(Ht), 1, 2), rtol=0, atol=2e-6
    )


def test_factorize_grid_matches_per_k(tmp_path, monkeypatch):
    # pipeline A/B: CNMF_TPU_GRID on vs off writes identical spectra files
    import pandas as pd

    from cnmf_tpu import cNMF
    from cnmf_tpu.io.dataframe import load_df_from_npz, save_df_to_npz

    rng = np.random.RandomState(42)
    W = rng.gamma(0.7, 1.0, size=(80, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 120)) * (rng.rand(5, 120) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X, index=[f"c{i}" for i in range(80)],
        columns=[f"g{j}" for j in range(120)],
    )
    counts = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts)

    results = {}
    for mode in ["1", "0"]:
        monkeypatch.setenv("CNMF_TPU_GRID", mode)
        obj = cNMF(output_dir=str(tmp_path), name=f"grid{mode}")
        obj.prepare(counts_fn=counts, components=[4, 5, 9], n_iter=3,
                    seed=14, num_highvar_genes=60)
        # use_mesh=False: the conftest's 8-device CPU mesh would otherwise
        # disqualify the single-device grid gate and compare per-K to per-K
        obj.factorize(verbose=False, use_mesh=False)
        results[mode] = {
            (k, i): load_df_from_npz(obj.paths["iter_spectra"] % (k, i))
            for k in [4, 5, 9] for i in range(3)
        }
    for key, on in results["1"].items():
        off = results["0"][key]
        assert on.index.equals(off.index) and on.columns.equals(off.columns)
        np.testing.assert_allclose(
            on.values, off.values, rtol=0,
            atol=1e-5 * max(1.0, np.abs(off.values).max()),
        )


@pytest.mark.parametrize("s0,seg_len,max_iter", [(20, 10, 95), (30, 25, 100)])
def test_staged_matches_plain_solver(s0, seg_len, max_iter):
    # mixed pad buckets (K=5 -> pad 8, K=11 -> pad 16) through one staged call
    from cnmf_tpu.ops.nmf import nmf_cd_staged

    rng = np.random.RandomState(1)
    N, G = 60, 40
    X = np.abs(rng.standard_normal((N, G))).astype(np.float32)
    Xd = jnp.asarray(X)

    inits, refs = [], []
    for i, (k, pad_k) in enumerate([(5, 8), (6, 8), (11, 16)]):
        W0, Ht0 = _mk(8, N, G, k, pad_k, seed=10 + i)
        inits.append((jnp.asarray(W0), jnp.asarray(Ht0)))
        _, Ht, n = nmf_coordinate_descent(
            Xd, jnp.asarray(W0), jnp.asarray(Ht0),
            tol=1e-3, max_iter=max_iter,
        )
        refs.append((np.swapaxes(np.asarray(Ht), 1, 2), np.asarray(n)))

    outs = nmf_cd_staged(Xd, inits, tol=1e-3, max_iter=max_iter,
                         s0=s0, seg_len=seg_len, min_bucket=8)
    assert len(outs) == 3
    tails = 0
    for (spec, n_iter), (ref_spec, ref_n) in zip(outs, refs):
        np.testing.assert_array_equal(n_iter, ref_n)
        np.testing.assert_allclose(spec, ref_spec, rtol=0, atol=2e-6)
        tails += int((ref_n > s0).sum())
    assert tails > 0  # the continuation phase really ran


def test_staged_all_converge_in_phase1():
    from cnmf_tpu.ops.nmf import nmf_cd_staged

    rng = np.random.RandomState(2)
    X = np.abs(rng.standard_normal((30, 20))).astype(np.float32)
    W0, Ht0 = _mk(4, 30, 20, 4, 8, seed=3)
    _, Ht, n = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-2, max_iter=200,
    )
    assert int(np.asarray(n).max()) < 150
    outs = nmf_cd_staged(jnp.asarray(X), [(jnp.asarray(W0), jnp.asarray(Ht0))],
                         tol=1e-2, max_iter=200, s0=150, seg_len=25,
                         min_bucket=8)
    spec, n_iter = outs[0]
    np.testing.assert_array_equal(n_iter, np.asarray(n))
    np.testing.assert_allclose(
        spec, np.swapaxes(np.asarray(Ht), 1, 2), rtol=0, atol=2e-6
    )


def test_factorize_staged_matches_per_k(tmp_path, monkeypatch):
    import pandas as pd

    from cnmf_tpu import cNMF
    from cnmf_tpu.io.dataframe import load_df_from_npz, save_df_to_npz

    rng = np.random.RandomState(7)
    W = rng.gamma(0.7, 1.0, size=(80, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 120)) * (rng.rand(5, 120) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X, index=[f"c{i}" for i in range(80)],
        columns=[f"g{j}" for j in range(120)],
    )
    counts = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts)

    results = {}
    for mode in ["1", "0"]:
        monkeypatch.setenv("CNMF_TPU_STAGED", mode)
        obj = cNMF(output_dir=str(tmp_path), name=f"staged{mode}")
        obj.prepare(counts_fn=counts, components=[4, 9], n_iter=3,
                    seed=14, num_highvar_genes=60)
        obj.factorize(verbose=False, use_mesh=False)
        results[mode] = {
            (k, i): load_df_from_npz(obj.paths["iter_spectra"] % (k, i))
            for k in [4, 9] for i in range(3)
        }
    for key, on in results["1"].items():
        off = results["0"][key]
        assert on.index.equals(off.index) and on.columns.equals(off.columns)
        np.testing.assert_allclose(
            on.values, off.values, rtol=0,
            atol=1e-5 * max(1.0, np.abs(off.values).max()),
        )
