"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The reference's only parallel axis is filesystem-mediated job sharding
(SURVEY §2.5); here the same grid runs on a jax.sharding.Mesh with a
``restart`` axis (embarrassingly parallel) and a ``cell`` axis (XLA inserts
psum for the cell-sharded XᵀW/WᵀW reductions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cnmf_tpu.ops.init import random_init_batch
from cnmf_tpu.ops.nmf import nmf_coordinate_descent
from cnmf_tpu.parallel.mesh import build_mesh, pad_to_multiple, shard_factorize_inputs


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_problem(n=64, g=48, k=6, b=8, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    X = (rng.gamma(1.0, 1.0, (n, g)) * (rng.rand(n, g) < 0.5)).astype(dtype) + 0.01
    W0, Ht0 = random_init_batch(X, k, np.arange(b) + 1, dtype=dtype)
    return X, W0, Ht0


@requires_8_devices
@pytest.mark.parametrize("cell_axis", [1, 2])
def test_sharded_cd_matches_single_device(cell_axis):
    X, W0, Ht0 = make_problem()
    mesh = build_mesh(jax.devices()[:8], cell_axis=cell_axis)

    Xd, W0d, Ht0d = shard_factorize_inputs(mesh, X, W0, Ht0)
    Ws, Hts, n_s = nmf_coordinate_descent(Xd, W0d, Ht0d, tol=1e-4, max_iter=150)

    W1, Ht1, n_1 = nmf_coordinate_descent(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-4, max_iter=150
    )

    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_1))
    np.testing.assert_allclose(
        np.asarray(Hts), np.asarray(Ht1), rtol=2e-4, atol=1e-5
    )


@requires_8_devices
def test_restart_padding_helper():
    arr = np.arange(10 * 3 * 2, dtype=np.float32).reshape(10, 3, 2)
    padded, n = pad_to_multiple(arr, 8)
    assert padded.shape[0] == 16 and n == 10
    np.testing.assert_array_equal(padded[10:], np.repeat(arr[:1], 6, axis=0))


@requires_8_devices
def test_factorize_pipeline_on_mesh(tmp_path):
    """End-to-end factorize with use_mesh=True on the virtual mesh matches the
    single-device spectra files."""
    import pandas as pd
    from cnmf_tpu import cNMF
    from cnmf_tpu.io.dataframe import load_df_from_npz

    rng = np.random.RandomState(3)
    X = rng.poisson(
        rng.gamma(0.7, 1.0, (120, 4)) @ (rng.gamma(0.5, 1.0, (4, 180)) * (rng.rand(4, 180) < 0.4))
        + 0.2
    ).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(120)],
                      columns=[f"g{j}" for j in range(180)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    results = {}
    for name, use_mesh in [("mesh", True), ("single", False)]:
        obj = cNMF(output_dir=str(tmp_path), name=name, compute_dtype=np.float64)
        obj.prepare(counts_fn=fn, components=[5], n_iter=9, seed=7, num_highvar_genes=90)
        obj.factorize(use_mesh=use_mesh, verbose=False)
        results[name] = [
            load_df_from_npz(obj.paths["iter_spectra"] % (5, i)).values
            for i in range(9)
        ]

    for a, b in zip(results["mesh"], results["single"]):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)


@requires_8_devices
@pytest.mark.parametrize("beta_loss", ["kullback-leibler", "itakura-saito"])
def test_shard_map_mu_matches_single_device(beta_loss):
    """The shard_map-over-restarts MU path (the one that keeps the fused
    Pallas kernels usable per shard on TPU) must be bit-equivalent to the
    single-device batched solver: the solver is restart-separable, so
    splitting the batch across devices changes nothing."""
    from cnmf_tpu.pipeline.solvers import solve_nmf_batch, solve_nmf_batch_sharded

    X, W0, Ht0 = make_problem(n=40, g=32, k=4, b=6, dtype=np.float64)
    X = X + 0.05  # strictly positive for IS
    kwargs = {"solver": "mu", "beta_loss": beta_loss, "tol": 1e-4,
              "max_iter": 60}
    mesh = build_mesh(jax.devices()[:8], cell_axis=1)
    Ws, Hts, n_s = solve_nmf_batch_sharded(
        mesh, jnp.asarray(X), W0, Ht0, kwargs, force_shard_map=True
    )
    W1, Ht1, n_1 = solve_nmf_batch(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Ht0), kwargs
    )
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_1))
    np.testing.assert_allclose(np.asarray(Hts), np.asarray(Ht1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(W1),
                               rtol=1e-10, atol=1e-12)


def _planted_counts(n, g, k, seed):
    rng = np.random.RandomState(seed)
    X = rng.poisson(
        rng.gamma(0.7, 1.0, (n, k)) @ (rng.gamma(0.5, 1.0, (k, g)) * (rng.rand(k, g) < 0.4))
        + 0.2
    ).astype(float)
    X[X.sum(axis=1) == 0, 0] = 1
    return X


@requires_8_devices
@pytest.mark.parametrize("beta_loss", ["frobenius", "kullback-leibler"])
def test_consensus_sharded_matches_replicated(tmp_path, beta_loss):
    """Full consensus with the data matrix cell-sharded over the 8-device
    mesh (zero-padded to even shards: 84 % 8 != 0) must reproduce the
    replicated single-buffer run — NNLS refits, z-score OLS, final refit and
    the fused k-stats all run GSPMD-partitioned with psum'd reductions."""
    import pandas as pd
    from cnmf_tpu import cNMF
    from cnmf_tpu.io.dataframe import load_df_from_npz

    n = 84  # deliberately not divisible by 8
    X = _planted_counts(n, 150, 4, seed=11)
    df = pd.DataFrame(X, index=[f"c{i}" for i in range(n)],
                      columns=[f"g{j}" for j in range(150)])
    fn = str(tmp_path / "counts.txt")
    df.to_csv(fn, sep="\t")

    name = f"cons_{beta_loss[:4]}"
    obj = cNMF(output_dir=str(tmp_path), name=name, compute_dtype=np.float64)
    obj.prepare(counts_fn=fn, components=[4], n_iter=8, seed=5,
                num_highvar_genes=80, beta_loss=beta_loss, max_NMF_iter=300)
    obj.factorize(verbose=False)
    obj.combine()

    artifacts = ["consensus_spectra", "consensus_usages",
                 "gene_spectra_tpm", "gene_spectra_score"]
    results = {}
    for mode, shard in [("replicated", False), ("sharded", True)]:
        run = cNMF(output_dir=str(tmp_path), name=name,
                   compute_dtype=np.float64)
        run.shard_cells = shard
        stats = run.consensus(k=4, skip_density_and_return_after_stats=True,
                              show_clustering=False)
        run.consensus(k=4, density_threshold=0.5, show_clustering=False,
                      build_ref=False)
        results[mode] = {
            key: load_df_from_npz(run.paths[key] % (4, "0_5")) for key in artifacts
        }
        results[mode]["stats"] = stats.values.astype(float)

    for key in artifacts:
        a, b = results["replicated"][key], results["sharded"][key]
        assert list(a.index) == list(b.index)
        np.testing.assert_allclose(a.values, b.values, rtol=1e-6, atol=1e-9,
                                   err_msg=key)
    np.testing.assert_allclose(
        results["replicated"]["stats"], results["sharded"]["stats"],
        rtol=1e-6, atol=1e-9,
    )


@requires_8_devices
def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@requires_8_devices
@pytest.mark.parametrize("n_devices", [1, 2, 4])
def test_graft_dryrun_device_counts(n_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_devices)
