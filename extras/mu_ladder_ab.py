#!/usr/bin/env python
"""On-chip A/B for the MU precision ladder (round-5 VERDICT #3).

Bench-shape KL problem (2700 cells x 2000 HVGs, K=10 padded to 16):
  wall  : B=100 restarts, plain MU at the bench precision ('high') vs the
          ladder (coarse 'default' sweeps -> 'high' finish). Warm timing —
          each variant runs twice, min reported, compile excluded.
  drift : B=8 restarts vs an f64 CPU oracle (same seeds/init): relative
          SSE of the L1-normalized spectra + final KL divergence ratio.

Writes one JSON line; record the verdict in TODO.md.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("CNMF_TPU_MATMUL_PRECISION", "high")

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def synth(n=2700, g=2000, k_true=10, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.gamma(0.7, 1.0, size=(n, k_true))
    H = rng.gamma(0.5, 1.0, size=(k_true, g)) * (rng.rand(k_true, g) < 0.4)
    X = rng.poisson(W @ H * 2.0).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    std = X.std(axis=0, ddof=1)
    std[std == 0] = 1.0
    return (X / std).astype(np.float32)


def main():
    from cnmf_tpu.ops.init import random_init_batch
    from cnmf_tpu.ops.nmf import (
        beta_divergence_error,
        nmf_mu_precision_ladder,
        nmf_multiplicative_update,
    )

    X = synth()
    k, pad_k, B = 10, 16, 100
    rng = np.random.RandomState(7)
    seeds = rng.randint(1, 2**31 - 1, size=B)
    W0, Ht0 = random_init_batch(X, k, seeds, dtype=np.float32)
    W0 = np.pad(W0, ((0, 0), (0, 0), (0, pad_k - k)))
    Ht0 = np.pad(Ht0, ((0, 0), (0, 0), (0, pad_k - k)))
    Xd = jnp.asarray(X)
    W0d, Ht0d = jnp.asarray(W0), jnp.asarray(Ht0)
    float(jnp.zeros(()))  # absorb link setup

    cfg = dict(beta=1.0, tol=1e-4, max_iter=200)

    def run_plain():
        W, Ht, n = nmf_multiplicative_update(Xd, W0d, Ht0d, **cfg)
        return np.asarray(Ht), np.asarray(n)

    def run_ladder():
        W, Ht, n = nmf_mu_precision_ladder(Xd, W0d, Ht0d, **cfg)
        return np.asarray(Ht), np.asarray(n)

    out = {"precision": os.environ["CNMF_TPU_MATMUL_PRECISION"]}
    for name, fn in [("plain", run_plain), ("ladder", run_ladder)]:
        walls = []
        for rep in range(3):
            t0 = time.perf_counter()
            Ht, n = fn()
            walls.append(time.perf_counter() - t0)
            log(f"{name} rep{rep}: {walls[-1]:.2f}s n_iter mean "
                f"{float(n.mean()):.1f}")
        out[name] = {"wall_warm_s": round(min(walls[1:]), 3),
                     "wall_cold_s": round(walls[0], 3),
                     "n_iter_mean": float(n.mean())}
        out[name + "_Ht"] = Ht

    # drift anchor at B=8: plain f32 MU at 'highest' (x64 miscompiles on
    # this TPU, CLAUDE.md — 'highest' f32 is the strongest on-chip anchor;
    # the known 'high' vs 'highest' gap is ~8.5e-6 on artifacts)
    Bs = 8
    Xs = Xd
    W_hp, Ht_hp, n_hp = nmf_multiplicative_update(
        Xs, jnp.asarray(W0[:Bs]), jnp.asarray(Ht0[:Bs]),
        precision="highest", **cfg)
    Ht_hp = np.asarray(Ht_hp)

    def norm_spectra(Ht):
        S = np.transpose(Ht[:Bs, :, :k], (0, 2, 1))  # (B, k, G)
        s = S.sum(axis=2, keepdims=True)
        return S / np.where(s == 0, 1.0, s)

    ref = norm_spectra(Ht_hp)
    for name in ("plain", "ladder"):
        got = norm_spectra(out.pop(name + "_Ht"))
        out[name]["spectra_rel_sse_vs_highest"] = float(
            ((got - ref) ** 2).sum() / (ref ** 2).sum()
        )
    err_hp = np.asarray(beta_divergence_error(
        Xs, jnp.asarray(W_hp), jnp.asarray(Ht_hp), 1.0))
    out["objective_ref_mean"] = float(err_hp.mean())
    out["speedup"] = round(
        out["plain"]["wall_warm_s"] / out["ladder"]["wall_warm_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
