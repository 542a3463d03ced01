"""Compact TPM upload (ops/device_tpm): integer-counts stash + on-device
row scaling must reproduce the host TPM within float32 double-rounding, and
the prepare-time stash must key the device cache to the exact object a
same-process read-back returns."""

import numpy as np
import pandas as pd
import scipy.sparse as sp

from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import save_df_to_npz
from cnmf_tpu.ops.device_tpm import (
    compact_integer_counts,
    device_tpm_from_counts,
    tpm_row_scale,
)
from cnmf_tpu.ops.normalize import normalize_total


def test_compact_dtype_selection():
    rng = np.random.RandomState(0)
    small = rng.randint(0, 200, size=(30, 40)).astype(np.float64)
    ints = compact_integer_counts(small)
    assert ints is not None and ints.dtype == np.uint8
    np.testing.assert_array_equal(ints, small)

    mid = rng.randint(0, 30000, size=(30, 40)).astype(np.float64)
    mid[0, 0] = 300  # above uint8
    mid[1, 1] = 30000
    ints = compact_integer_counts(mid)
    assert ints is not None and ints.dtype == np.int16
    np.testing.assert_array_equal(ints, mid)


def test_compact_rejects_unsuitable_inputs():
    rng = np.random.RandomState(1)
    base = rng.randint(0, 100, size=(10, 12)).astype(np.float64)
    frac = base.copy()
    frac[2, 3] = 1.5
    assert compact_integer_counts(frac) is None  # non-integral
    neg = base.copy()
    neg[0, 0] = -1
    assert compact_integer_counts(neg) is None  # negative
    wide = base.copy()
    wide[0, 0] = 40000
    assert compact_integer_counts(wide) is None  # exceeds int16
    assert compact_integer_counts(sp.csr_matrix(base)) is None  # sparse
    nan = base.copy()
    nan[0, 0] = np.nan
    assert compact_integer_counts(nan) is None


def test_device_tpm_matches_host_product():
    rng = np.random.RandomState(2)
    X = rng.poisson(3.0, size=(50, 80)).astype(np.float64)
    X[7] = 0  # zero-sum cell: safe-denominator path
    host = normalize_total(X, target_sum=1e6).astype(np.float32)
    ints = compact_integer_counts(X)
    scale = tpm_row_scale(X).astype(np.float32)
    dev = np.asarray(device_tpm_from_counts(ints, scale))
    assert dev.dtype == np.float32
    # both sides round the true product to f32; the device side also rounds
    # the scale — equal to <= 2 ulp
    np.testing.assert_allclose(dev, host, rtol=3e-7, atol=0.0)
    assert (dev[7] == 0).all()


def _dense_prepared(tmp_path, name):
    rng = np.random.RandomState(3)
    X = rng.poisson(2.0, size=(90, 150)).astype(np.float64)
    X[X.sum(axis=1) == 0, 0] = 1
    df = pd.DataFrame(
        X,
        index=[f"c{i}" for i in range(X.shape[0])],
        columns=[f"g{j}" for j in range(X.shape[1])],
    )
    counts_fn = str(tmp_path / "counts.df.npz")
    save_df_to_npz(df, counts_fn)
    obj = cNMF(output_dir=str(tmp_path), name=name)
    obj.prepare(counts_fn=counts_fn, components=[4], n_iter=4, seed=14,
                num_highvar_genes=60)
    return obj


def test_prepare_stashes_compact_tpm_keyed_to_readback(tmp_path):
    obj = _dense_prepared(tmp_path, "stash_on")
    stash = getattr(obj, "_tpm_compact", None)
    assert stash is not None, "dense integer counts should stash"
    ref, ints, scale = stash
    assert ints.dtype == np.uint8 and scale.dtype == obj.compute_dtype
    # the stash key IS the object a same-process read-back returns, so the
    # device cache populated from it hits in consensus
    tpm = obj._read_h5ad_cached(obj.paths["tpm"])
    assert ref() is tpm
    # the derived device buffer matches the float upload consensus would do
    dev = np.asarray(device_tpm_from_counts(ints, scale))
    host = np.asarray(tpm.X, dtype=np.float64)
    np.testing.assert_allclose(dev, host, rtol=3e-7, atol=1e-12)


def test_stash_disabled_by_knob(tmp_path, monkeypatch):
    monkeypatch.setenv("CNMF_TPU_DEVICE_TPM", "0")
    obj = _dense_prepared(tmp_path, "stash_off")
    assert getattr(obj, "_tpm_compact", None) is None
    # the norm stash rides the same integer image
    assert getattr(obj, "_norm_compact", None) is None


def test_norm_column_spec_and_device_derive():
    from cnmf_tpu.ops.device_tpm import norm_column_spec, norm_from_counts

    rng = np.random.RandomState(4)
    X = rng.poisson(2.5, size=(60, 30)).astype(np.float64)
    X[:, 5] += 1  # keep every candidate column non-constant
    names = pd.Index([f"g{j}" for j in range(30)])
    hvg = pd.Index(["g7", "g2", "g19"])
    ints = compact_integer_counts(X)
    spec = norm_column_spec(names, hvg, ints, np.dtype(np.float32))
    assert spec is not None
    cols, std = spec
    np.testing.assert_array_equal(cols, [7, 2, 19])
    # std replicates scale_unit_variance's dense divisor bit-for-bit (f64)
    sub = X[:, [7, 2, 19]]
    np.testing.assert_array_equal(
        std, sub.std(axis=0, ddof=1).astype(np.float32)
    )
    dev = np.asarray(norm_from_counts(ints, cols, std))
    host = (sub / sub.std(axis=0, ddof=1)).astype(np.float32)
    np.testing.assert_allclose(dev, host, rtol=3e-7, atol=0.0)

    # degenerate / unmappable inputs fall back
    const = X.copy()
    const[:, 2] = 3
    ints_c = compact_integer_counts(const)
    assert norm_column_spec(names, hvg, ints_c, np.dtype(np.float32)) is None
    dup = pd.Index(["g0"] * 30)
    assert norm_column_spec(dup, hvg, ints, np.dtype(np.float32)) is None
    missing = pd.Index(["nope"])
    assert norm_column_spec(names, missing, ints, np.dtype(np.float32)) is None


def test_prepare_stashes_norm_spec_keyed_to_readback(tmp_path):
    obj = _dense_prepared(tmp_path, "nstash")
    nstash = getattr(obj, "_norm_compact", None)
    assert nstash is not None
    ref, ints, cols, std = nstash
    nc = obj._read_h5ad_cached(obj.paths["normalized_counts"])
    assert ref() is nc
    from cnmf_tpu.ops.device_tpm import norm_from_counts

    dev = np.asarray(norm_from_counts(ints, cols, std))
    host = np.asarray(nc.X, dtype=np.float64)
    np.testing.assert_allclose(dev, host, rtol=3e-7, atol=1e-12)


def test_device_norm_pipeline_smoke(tmp_path, monkeypatch):
    """Forced CNMF_TPU_DEVICE_NORM=1 on CPU: the full pipeline completes and
    the consensus artifacts stay within the float32 input-perturbation
    envelope of the exact path (iterative solves amplify the <=2 ulp input
    difference, so this is a coarse equivalence, not bit parity)."""
    from cnmf_tpu.io.dataframe import load_df_from_npz

    outs = {}
    for knob, name in (("0", "dn_off"), ("1", "dn_on")):
        monkeypatch.setenv("CNMF_TPU_DEVICE_NORM", knob)
        obj = _dense_prepared(tmp_path, name)
        obj.factorize(verbose=False)
        # the derive path must actually run when forced (it once silently
        # fell back because factorize dropped the h5ad cache, breaking the
        # stash's object-identity key)
        assert (getattr(obj, "_ints_dev", None) is not None) == (knob == "1")
        obj.combine()
        obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
        outs[knob] = load_df_from_npz(
            obj.paths["consensus_spectra"] % (4, "2_0")
        ).values
    num = ((outs["0"] - outs["1"]) ** 2).sum()
    den = (outs["0"] ** 2).sum()
    assert num / den < 1e-5, f"relative SSE {num/den:.2e}"


def test_compact_alias_is_readonly():
    """An already-minimal-dtype input aliases as a FROZEN view: the stash's
    <=2-ulp contract depends on post-prepare immutability, so accidental
    caller mutation must fail loudly instead of silently corrupting it."""
    rng = np.random.RandomState(7)
    X = rng.randint(0, 200, size=(20, 15)).astype(np.uint8)
    ints = compact_integer_counts(X)
    assert ints is not None and ints.base is X  # zero-copy alias kept
    with np.testing.assert_raises(ValueError):
        ints[0, 0] = 1
    X[0, 0] = 9  # the caller's own array stays writable


def test_norm_column_spec_rejects_misaligned_std():
    """A passed-in std vector whose column ORDER doesn't match the HVG
    subset must be rejected (fall back to the exact float path), not
    silently mis-scale genes."""
    from cnmf_tpu.ops.device_tpm import norm_column_spec

    rng = np.random.RandomState(8)
    X = rng.poisson(2.5, size=(60, 30)).astype(np.float64)
    X += rng.poisson(5.0, size=(60, 30))  # distinct per-column stds
    names = pd.Index([f"g{j}" for j in range(30)])
    hvg = pd.Index(["g7", "g2", "g19"])
    ints = compact_integer_counts(X)
    good = X[:, [7, 2, 19]].std(axis=0, ddof=1)
    spec = norm_column_spec(
        names, hvg, ints, np.dtype(np.float32), std=good
    )
    assert spec is not None
    shuffled = good[[1, 2, 0]]  # right values, wrong order
    assert norm_column_spec(
        names, hvg, ints, np.dtype(np.float32), std=shuffled
    ) is None


def test_fused_derive_matches_separate_programs():
    """derive_norm_and_tpm must be bit-identical to the two programs it
    replaces (same elementwise op sequences over the same integer image)."""
    from cnmf_tpu.ops.device_tpm import (
        derive_norm_and_tpm,
        norm_from_counts,
        tpm_from_counts,
    )
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    X = rng.poisson(2.0, size=(40, 25)).astype(np.float64)
    X[:, 3] += 1
    ints = compact_integer_counts(X)
    cols = np.array([3, 11, 7], dtype=np.int32)
    std = X[:, cols].std(axis=0, ddof=1).astype(np.float32)
    scale = tpm_row_scale(X).astype(np.float32)

    norm_f, tpm_f = derive_norm_and_tpm(
        jnp.asarray(ints), jnp.asarray(cols), jnp.asarray(std),
        jnp.asarray(scale),
    )
    np.testing.assert_array_equal(
        np.asarray(norm_f),
        np.asarray(norm_from_counts(jnp.asarray(ints), jnp.asarray(cols),
                                    jnp.asarray(std))),
    )
    np.testing.assert_array_equal(
        np.asarray(tpm_f),
        np.asarray(tpm_from_counts(jnp.asarray(ints), jnp.asarray(scale))),
    )


def test_fused_derive_seeds_consensus_tpm_cache(tmp_path, monkeypatch):
    """With device-norm forced and the prefetch on, factorize derives the
    consensus device TPM in the SAME program as its input; the prefetch
    thread must find the seeded cache and move nothing, and consensus must
    reuse the buffer (values match the float upload to f32 rounding)."""
    monkeypatch.setenv("CNMF_TPU_DEVICE_NORM", "1")
    obj = _dense_prepared(tmp_path, "fusedtpm")
    obj.shard_cells = False  # single-device layout on the 8-dev CPU mesh
    target, scale = obj._fused_tpm_derive_target()
    assert target is not None and scale is not None
    obj.factorize(verbose=False)
    cached = getattr(obj, "_tpm_dev_cache", None)
    assert cached is not None and cached[0]() is target
    tpm_dev = np.asarray(cached[1])
    host_tpm = np.asarray(target.X, dtype=np.float64)
    np.testing.assert_allclose(tpm_dev, host_tpm, rtol=3e-7, atol=0.0)
    obj.combine()
    obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
