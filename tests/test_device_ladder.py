"""On-device ladder compaction (ops.nmf.nmf_cd_device_ladder) parity.

The single-program shrinking-batch schedule reproduces the plain batched
solver: frozen restarts never update, re-packing drops only finished rows,
and every restart's final spectra land in the output buffer under its
original index. At float64 the match is exact (identical n_iter AND
factors): per-restart math is independent of batch composition and the f64
matmul reduction is blocking-stable. At float32 a batch-size change perturbs
XLA's matmul reduction order by ~1e-7, which the non-smooth CD iteration
amplifies over hundreds of sweeps — the *plain* solver shows the same
~1e-3 drift between a B=20 and a B=16 run, so f32 is pinned at that
documented scale, not bit-exactness. The pipeline-level A/B pins the
factorize() integration (CNMF_TPU_DEVICE_LADDER) end to end at f64.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from cnmf_tpu.ops.nmf import (
    _ladder,
    nmf_cd_device_ladder,
    nmf_coordinate_descent,
)


def _mk(B, N, G, K, pad_k, seed, dtype):
    rng = np.random.RandomState(seed)
    W0 = np.abs(rng.standard_normal((B, N, K))).astype(dtype)
    Ht0 = np.abs(rng.standard_normal((B, G, K))).astype(dtype)
    W0 = np.pad(W0, ((0, 0), (0, 0), (0, pad_k - K)))
    Ht0 = np.pad(Ht0, ((0, 0), (0, 0), (0, pad_k - K)))
    return W0, Ht0


@pytest.mark.parametrize("B,max_iter,min_bucket", [
    (20, 120, 8),     # ladder (24, 16, 8): padding + two re-packs
    (20, 15, 8),      # max_iter hit mid-ladder: unfinished rows must flush
    (8, 200, 8),      # single-rung ladder == plain solver
])
def test_device_ladder_matches_plain_solver_f64(B, max_iter, min_bucket):
    rng = np.random.RandomState(0)
    N, G, k, pad_k = 60, 40, 6, 8
    X = np.abs(rng.standard_normal((N, G)))
    Xd = jnp.asarray(X)
    W0, Ht0 = _mk(B, N, G, k, pad_k, seed=3, dtype=np.float64)

    _, Ht_ref, n_ref = nmf_coordinate_descent(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-3, max_iter=max_iter,
    )
    spec_ref = np.swapaxes(np.asarray(Ht_ref), 1, 2)

    ladder = tuple(_ladder(B, min_bucket))
    spec, n, stage_sweeps = nmf_cd_device_ladder(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-3, max_iter=max_iter, ladder=ladder,
    )
    spec, n = np.asarray(spec), np.asarray(n)

    assert spec.shape == (B, pad_k, G)
    # total sweeps across ladder stages == the batch's slowest restart
    assert int(np.asarray(stage_sweeps).sum()) == int(np.asarray(n_ref).max())
    np.testing.assert_array_equal(n, np.asarray(n_ref))
    np.testing.assert_allclose(spec, spec_ref, rtol=0, atol=1e-10)


def test_device_ladder_f32_drift_bounded():
    """f32 re-packing drift stays at the same scale as the plain solver's own
    batch-size sensitivity (~1e-3 after a hundred sweeps) — not a new error
    source, just reduction-order noise through a non-smooth iteration."""
    rng = np.random.RandomState(0)
    N, G, k, pad_k, B = 60, 40, 6, 8, 20
    X = np.abs(rng.standard_normal((N, G))).astype(np.float32)
    Xd = jnp.asarray(X)
    W0, Ht0 = _mk(B, N, G, k, pad_k, seed=3, dtype=np.float32)

    _, Ht_ref, n_ref = nmf_coordinate_descent(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-3, max_iter=120,
    )
    spec_ref = np.swapaxes(np.asarray(Ht_ref), 1, 2)
    spec, n, _ = nmf_cd_device_ladder(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-3, max_iter=120, ladder=tuple(_ladder(B, 8)),
    )
    scale = np.abs(spec_ref).max()
    assert np.abs(np.asarray(spec) - spec_ref).max() <= 1e-3 * scale


def test_device_ladder_heterogeneous_convergence():
    """Restarts planted at very different convergence speeds: some start at
    the solution (converge in a few sweeps), some from noise — exercises the
    ladder's early re-packs with mixed done patterns."""
    rng = np.random.RandomState(7)
    N, G, k = 50, 30, 4
    Wt = np.abs(rng.standard_normal((N, k)))
    Htt = np.abs(rng.standard_normal((G, k)))
    X = Wt @ Htt.T
    Xd = jnp.asarray(X)

    B = 18
    W0 = np.abs(rng.standard_normal((B, N, k)))
    Ht0 = np.abs(rng.standard_normal((B, G, k)))
    # plant near-solution inits in scattered batch positions
    for b in (1, 4, 5, 11, 16):
        W0[b] = Wt + 1e-5
        Ht0[b] = Htt + 1e-5

    _, Ht_ref, n_ref = nmf_coordinate_descent(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0), tol=1e-4, max_iter=300,
    )
    spec_ref = np.swapaxes(np.asarray(Ht_ref), 1, 2)

    spec, n, _ = nmf_cd_device_ladder(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0),
        tol=1e-4, max_iter=300, ladder=tuple(_ladder(B, 8)),
    )
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(spec), spec_ref, rtol=0, atol=1e-10)
    # the planted fast restarts must actually have exited early
    assert np.asarray(n)[[1, 4, 5, 11, 16]].max() < 50


def test_device_ladder_pipeline_ab(tmp_path):
    """factorize() under CNMF_TPU_DEVICE_LADDER=1 writes the same spectra as
    the default path at compute_dtype=float64 (fresh subprocess so the env
    knob is read cleanly)."""
    script = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, pandas as pd
out = sys.argv[1]
rng = np.random.RandomState(11)
X = rng.poisson(
    np.abs(rng.standard_normal((80, 120))) * 2.0
).astype(float)
X[X.sum(1) == 0, 0] = 1
pd.DataFrame(
    X, index=[f"c{i}" for i in range(80)],
    columns=[f"g{j}" for j in range(120)],
).to_csv(os.path.join(out, "counts.txt"), sep="\t")

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz

specs = {}
for tag, knob in [("base", "0"), ("ladder", "1")]:
    os.environ["CNMF_TPU_DEVICE_LADDER"] = knob
    obj = cNMF(output_dir=out, name=tag, compute_dtype=np.float64)
    obj.prepare(counts_fn=os.path.join(out, "counts.txt"),
                components=[4, 5], n_iter=6, seed=9,
                num_highvar_genes=60)
    obj.factorize()
    obj.combine()
    specs[tag] = {
        kk: load_df_from_npz(obj.paths["merged_spectra"] % kk)
        for kk in (4, 5)
    }
for kk in (4, 5):
    a, b = specs["base"][kk], specs["ladder"][kk]
    assert list(a.index) == list(b.index)
    np.testing.assert_allclose(a.values, b.values, rtol=0, atol=1e-9)
print("AB OK")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "AB OK" in proc.stdout


@pytest.mark.parametrize("beta,tol", [(1.0, 1e-3), (2.0, 1e-3)])
def test_mu_device_ladder_matches_plain_solver_f64(beta, tol):
    from cnmf_tpu.ops.nmf import nmf_mu_device_ladder, nmf_multiplicative_update

    rng = np.random.RandomState(2)
    N, G, k, B = 40, 30, 4, 20
    X = np.abs(rng.standard_normal((N, G))) + 0.1
    Xd = jnp.asarray(X)
    W0 = np.abs(rng.standard_normal((B, N, k))) + 0.1
    Ht0 = np.abs(rng.standard_normal((B, G, k))) + 0.1

    _, Ht_ref, n_ref = nmf_multiplicative_update(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0),
        beta=beta, tol=tol, max_iter=200,
    )
    spec_ref = np.swapaxes(np.asarray(Ht_ref), 1, 2)

    spec, n, stage_sweeps = nmf_mu_device_ladder(
        Xd, jnp.asarray(W0), jnp.asarray(Ht0),
        beta=beta, tol=tol, max_iter=200, ladder=tuple(_ladder(B, 8)),
    )
    assert int(np.asarray(stage_sweeps).sum()) == int(np.asarray(n_ref).max())
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(spec), spec_ref, rtol=0, atol=1e-10)
