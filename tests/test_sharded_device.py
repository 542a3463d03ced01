"""Mesh factorize with ON-DEVICE init + ladder (VERDICT round-3 item 3):
the round-2/3 link-byte optimizations were single-device-gated; round 4
brings them to the restart-axis mesh as one shard_map program per K
(pipeline/solvers.solve_nmf_sharded_device). These tests pin, on the
virtual 8-device CPU mesh at float64:

* solver-level exactness: the sharded init+ladder program reproduces the
  plain batched CD solver bit-for-bit from the same seeds (the ladder is
  exact at f64 regardless of the local schedule, and the device init's
  draws are seed-keyed and partition-independent);
* pipeline-level equivalence: factorize(use_mesh=True) writes the same
  spectra files as the single-device device-init ladder run, and actually
  takes the sharded path.
"""

import numpy as np
import pandas as pd
import pytest

import jax

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz


@pytest.fixture()
def force_device_paths(monkeypatch):
    monkeypatch.setenv("CNMF_TPU_DEVICE_INIT", "force")
    monkeypatch.setenv("CNMF_TPU_DEVICE_LADDER", "1")


def test_sharded_solver_matches_plain_cd(force_device_paths):
    from cnmf_tpu.ops.init import random_init_batch_device
    from cnmf_tpu.ops.nmf import nmf_coordinate_descent
    from cnmf_tpu.parallel.mesh import build_mesh
    from cnmf_tpu.pipeline.solvers import solve_nmf_sharded_device

    rng = np.random.RandomState(5)
    N, G, k, pad_k, B = 90, 70, 5, 8, 24
    X = np.abs(rng.randn(N, G)).astype(np.float64)
    seeds = rng.randint(1, 2**31 - 1, size=B)
    x_mean = float(X.mean())
    kwargs = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4,
              "max_iter": 150}

    mesh = build_mesh()
    spec, n_iter, (ladder, stage_sweeps) = solve_nmf_sharded_device(
        mesh, jax.numpy.asarray(X), seeds, x_mean, k, pad_k, kwargs
    )
    spec = np.asarray(spec)
    n_iter = np.asarray(n_iter)

    W0, Ht0 = random_init_batch_device(x_mean, N, G, k, seeds, pad_k=pad_k,
                                       dtype=np.float64)
    W_p, Ht_p, n_p = nmf_coordinate_descent(
        jax.numpy.asarray(X), W0, Ht0, tol=1e-4, max_iter=150
    )
    spec_plain = np.swapaxes(np.asarray(Ht_p), 1, 2)

    np.testing.assert_array_equal(n_iter, np.asarray(n_p))
    np.testing.assert_array_equal(spec, spec_plain)
    # executed-FLOP accounting reflects the shrinking per-shard batches
    assert len(np.asarray(stage_sweeps)) == len(ladder)
    assert float(np.asarray(stage_sweeps).sum()) >= float(n_iter.max())


def test_seeded_single_device_matches_plain_cd(force_device_paths):
    """The single-device fused init+ladder program (round-4 cold-start work,
    pipeline/solvers._seeded_ladder) reproduces the plain batched CD solver
    bit-for-bit from the same seeds at f64 — same contract as the sharded
    twin above."""
    from cnmf_tpu.ops.init import random_init_batch_device
    from cnmf_tpu.ops.nmf import nmf_coordinate_descent
    from cnmf_tpu.pipeline.solvers import solve_nmf_batch_ladder_seeded

    rng = np.random.RandomState(6)
    N, G, k, pad_k, B = 80, 60, 6, 8, 20
    X = np.abs(rng.randn(N, G)).astype(np.float64)
    seeds = rng.randint(1, 2**31 - 1, size=B)
    x_mean = float(X.mean())
    kwargs = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4,
              "max_iter": 150}

    spec, n_iter, (ladder, stage_sweeps) = solve_nmf_batch_ladder_seeded(
        jax.numpy.asarray(X), seeds, x_mean, k, pad_k, kwargs
    )
    W0, Ht0 = random_init_batch_device(x_mean, N, G, k, seeds, pad_k=pad_k,
                                       dtype=np.float64)
    _, Ht_p, n_p = nmf_coordinate_descent(
        jax.numpy.asarray(X), W0, Ht0, tol=1e-4, max_iter=150
    )
    np.testing.assert_array_equal(np.asarray(n_iter), np.asarray(n_p))
    np.testing.assert_array_equal(
        np.asarray(spec), np.swapaxes(np.asarray(Ht_p), 1, 2)
    )
    assert len(np.asarray(stage_sweeps)) == len(ladder)


def test_mesh_factorize_matches_single_device(force_device_paths, tmp_path):
    rng = np.random.RandomState(12)
    W = rng.gamma(0.7, 1.0, size=(130, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 190)) * (rng.rand(5, 190) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(130)],
                      columns=[f"g{j}" for j in range(190)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    cfg = dict(components=[5, 9], n_iter=6, seed=3, num_highvar_genes=110)

    import cnmf_tpu.pipeline.cnmf as cnmf_mod

    calls = []
    orig = cnmf_mod.solve_nmf_sharded_device

    def spy(*args, **kw):
        calls.append(np.shape(args[2]))  # seed vector
        return orig(*args, **kw)

    cnmf_mod.solve_nmf_sharded_device = spy
    try:
        a = cNMF(output_dir=str(tmp_path), name="mesh",
                 compute_dtype=np.float64)
        a.prepare(counts_fn=fn, **cfg)
        a.factorize(verbose=False, use_mesh=True)
    finally:
        cnmf_mod.solve_nmf_sharded_device = orig
    assert len(calls) == 2, "sharded device path not taken"

    b = cNMF(output_dir=str(tmp_path), name="single",
             compute_dtype=np.float64)
    b.prepare(counts_fn=fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    for k in (5, 9):
        for it in range(6):
            sa = load_df_from_npz(a.paths["iter_spectra"] % (k, it))
            sb = load_df_from_npz(b.paths["iter_spectra"] % (k, it))
            np.testing.assert_array_equal(sa.values, sb.values)


def test_gspmd_seeded_matches_plain_cd(force_device_paths):
    """Round-5 VERDICT #1: cell-sharded meshes get device init too — the
    GSPMD (init draw → constrained shardings → plain batched solve) program
    must reproduce the single-device device-init solve at f64 (the threefry
    draw is partition-independent; the psum'd cell-axis grams only reorder
    f64 reductions)."""
    from cnmf_tpu.ops.init import random_init_batch_device
    from cnmf_tpu.ops.nmf import nmf_coordinate_descent
    from cnmf_tpu.parallel.mesh import build_mesh
    from cnmf_tpu.pipeline.solvers import solve_nmf_batch_sharded_seeded

    rng = np.random.RandomState(9)
    N, G, k, pad_k, B = 91, 70, 5, 8, 24  # N deliberately odd: uneven shards
    X = np.abs(rng.randn(N, G)).astype(np.float64)
    seeds = rng.randint(1, 2**31 - 1, size=B)
    x_mean = float(X.mean())
    kwargs = {"solver": "cd", "beta_loss": "frobenius", "tol": 1e-4,
              "max_iter": 150}

    mesh = build_mesh(jax.devices()[:8], cell_axis=2)  # restart=4 x cell=2
    W_s, Ht_s, n_s = solve_nmf_batch_sharded_seeded(
        mesh, jax.numpy.asarray(X), seeds, x_mean, k, pad_k, kwargs
    )

    W0, Ht0 = random_init_batch_device(x_mean, N, G, k, seeds, pad_k=pad_k,
                                       dtype=np.float64)
    W_p, Ht_p, n_p = nmf_coordinate_descent(
        jax.numpy.asarray(X), W0, Ht0, tol=1e-4, max_iter=150
    )
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_p))
    np.testing.assert_allclose(np.asarray(Ht_s), np.asarray(Ht_p),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(W_s), np.asarray(W_p),
                               rtol=1e-7, atol=1e-10)


def test_gspmd_seeded_mu_matches_plain(force_device_paths):
    """Same contract for the MU/KL solver on a cell-sharded mesh (the atlas
    beta!=2 path)."""
    from cnmf_tpu.ops.init import random_init_batch_device
    from cnmf_tpu.ops.nmf import nmf_multiplicative_update
    from cnmf_tpu.parallel.mesh import build_mesh
    from cnmf_tpu.pipeline.solvers import solve_nmf_batch_sharded_seeded

    rng = np.random.RandomState(10)
    N, G, k, pad_k, B = 45, 40, 4, 8, 8
    X = (np.abs(rng.randn(N, G)) + 0.05).astype(np.float64)
    seeds = rng.randint(1, 2**31 - 1, size=B)
    x_mean = float(X.mean())
    kwargs = {"solver": "mu", "beta_loss": "kullback-leibler", "tol": 1e-4,
              "max_iter": 60}

    mesh = build_mesh(jax.devices()[:8], cell_axis=2)
    W_s, Ht_s, n_s = solve_nmf_batch_sharded_seeded(
        mesh, jax.numpy.asarray(X), seeds, x_mean, k, pad_k, kwargs
    )
    W0, Ht0 = random_init_batch_device(x_mean, N, G, k, seeds, pad_k=pad_k,
                                       dtype=np.float64)
    W_p, Ht_p, n_p = nmf_multiplicative_update(
        jax.numpy.asarray(X), W0, Ht0, beta=1.0, tol=1e-4, max_iter=60
    )
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_p))
    np.testing.assert_allclose(np.asarray(Ht_s), np.asarray(Ht_p),
                               rtol=1e-7, atol=1e-10)


def test_cell_sharded_factorize_device_init(force_device_paths, tmp_path,
                                            monkeypatch):
    """Pipeline-level: with CNMF_TPU_CELL_AXIS=2 the orchestrator builds a
    (restart x cell) mesh, factorize takes the GSPMD seeded path (no host
    noise crosses the link), and the spectra files match the single-device
    device-init run at f64 up to psum reduction order."""
    monkeypatch.setenv("CNMF_TPU_CELL_AXIS", "2")
    rng = np.random.RandomState(13)
    W = rng.gamma(0.7, 1.0, size=(110, 5))
    H = rng.gamma(0.5, 1.0, size=(5, 170)) * (rng.rand(5, 170) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(110)],
                      columns=[f"g{j}" for j in range(170)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    cfg = dict(components=[5], n_iter=6, seed=3, num_highvar_genes=100)

    import cnmf_tpu.pipeline.cnmf as cnmf_mod

    calls = []
    orig = cnmf_mod.solve_nmf_batch_sharded_seeded

    def spy(*args, **kw):
        calls.append(np.shape(args[2]))  # seed vector
        return orig(*args, **kw)

    cnmf_mod.solve_nmf_batch_sharded_seeded = spy
    try:
        a = cNMF(output_dir=str(tmp_path), name="cellmesh",
                 compute_dtype=np.float64)
        a.prepare(counts_fn=fn, **cfg)
        a.factorize(verbose=False, use_mesh=True)
    finally:
        cnmf_mod.solve_nmf_batch_sharded_seeded = orig
    assert len(calls) == 1, "GSPMD seeded path not taken on the cell mesh"

    monkeypatch.setenv("CNMF_TPU_CELL_AXIS", "1")
    b = cNMF(output_dir=str(tmp_path), name="singledev",
             compute_dtype=np.float64)
    b.prepare(counts_fn=fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    for it in range(6):
        sa = load_df_from_npz(a.paths["iter_spectra"] % (5, it))
        sb = load_df_from_npz(b.paths["iter_spectra"] % (5, it))
        np.testing.assert_allclose(sa.values, sb.values,
                                   rtol=1e-7, atol=1e-10)


def test_cell_sharded_factorize_host_init(tmp_path, monkeypatch):
    """Host-init (CNMF_TPU_DEVICE_INIT=0) on the cell-sharded mesh: X rows
    pre-pad for even shards, W gets matching zero rows, and the spectra
    files equal the single-device host-init run (same sklearn-bit-identical
    init → f64 psum-order tolerance)."""
    monkeypatch.setenv("CNMF_TPU_DEVICE_INIT", "0")
    monkeypatch.setenv("CNMF_TPU_CELL_AXIS", "2")
    rng = np.random.RandomState(17)
    n = 109  # not divisible by 2: exercises the zero-row padding
    W = rng.gamma(0.7, 1.0, size=(n, 4))
    H = rng.gamma(0.5, 1.0, size=(4, 160)) * (rng.rand(4, 160) < 0.35)
    X = rng.poisson(W @ H * 2.0).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(n)],
                      columns=[f"g{j}" for j in range(160)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")
    cfg = dict(components=[4], n_iter=5, seed=8, num_highvar_genes=90)

    a = cNMF(output_dir=str(tmp_path), name="cellhost",
             compute_dtype=np.float64)
    a.prepare(counts_fn=fn, **cfg)
    a.factorize(verbose=False, use_mesh=True)

    monkeypatch.setenv("CNMF_TPU_CELL_AXIS", "1")
    b = cNMF(output_dir=str(tmp_path), name="singlehost",
             compute_dtype=np.float64)
    b.prepare(counts_fn=fn, **cfg)
    b.factorize(verbose=False, use_mesh=False)

    for it in range(5):
        sa = load_df_from_npz(a.paths["iter_spectra"] % (4, it))
        sb = load_df_from_npz(b.paths["iter_spectra"] % (4, it))
        np.testing.assert_allclose(sa.values, sb.values,
                                   rtol=1e-7, atol=1e-10)
