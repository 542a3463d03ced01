"""CSR-compact integer upload (ops/device_tpm.upload_int_image): shipping the
stashed counts image as CSR components and scatter-densifying on device must
be BIT-identical to the dense transfer, gate correctly on the byte win, and
leave the device-norm pipeline byte-identical (same integer bits in, same
factors out)."""

import numpy as np
import pandas as pd

import cnmf_tpu.ops.device_tpm as dt
from cnmf_tpu import cNMF
from cnmf_tpu.io.dataframe import load_df_from_npz, save_df_to_npz


def _sparse_ints(n=60, g=90, fill=0.15, seed=0, dtype=np.uint8):
    rng = np.random.RandomState(seed)
    X = (rng.poisson(1.2, size=(n, g)) * (rng.rand(n, g) < fill)).astype(dtype)
    X[3] = 0          # an all-zero row
    X[:, 7] = 0       # an all-zero column
    X[-1] = 0         # zero LAST row (indptr tail edge)
    return X


def test_int_image_csr_components_reconstruct(monkeypatch):
    monkeypatch.setattr(dt, "_CSR_NNZ_BUCKET", 64)
    ints = _sparse_ints()
    csr = dt.int_image_csr(ints)
    assert csr is not None
    data, cols, indptr = csr
    assert data.dtype == ints.dtype
    assert cols.dtype == np.int16  # 90 columns fit int16
    assert indptr.dtype == np.int32 and indptr[-1] == data.size
    dense = np.zeros_like(ints)
    for r in range(ints.shape[0]):
        lo, hi = indptr[r], indptr[r + 1]
        dense[r, cols[lo:hi]] = data[lo:hi]
    np.testing.assert_array_equal(dense, ints)


def test_int_image_csr_declines_dense_images(monkeypatch):
    monkeypatch.setattr(dt, "_CSR_NNZ_BUCKET", 64)
    rng = np.random.RandomState(1)
    dense_img = (rng.poisson(4.0, size=(40, 50)) + 1).astype(np.uint8)
    assert dt.int_image_csr(dense_img) is None  # full image: no byte win
    # int16 data + wide (int32) columns on a barely-sparse image: no win
    wide = (rng.poisson(0.9, size=(8, 40000)) * 300).astype(np.int16)
    csr = dt.int_image_csr(wide)
    if csr is not None:  # fill draw may still clear the 0.9 gate
        assert csr[1].dtype == np.int32


def test_upload_int_image_bit_identity(monkeypatch):
    monkeypatch.setenv("CNMF_TPU_CSR_UPLOAD", "force")
    monkeypatch.setattr(dt, "_CSR_NNZ_BUCKET", 64)
    for dtype, seed in ((np.uint8, 2), (np.int16, 3)):
        ints = _sparse_ints(dtype=dtype, seed=seed)
        dev, nbytes = dt.upload_int_image(ints)
        assert dev.dtype == ints.dtype
        np.testing.assert_array_equal(np.asarray(dev), ints)
        assert nbytes < ints.nbytes
    # pre-built components take the same path
    ints = _sparse_ints(seed=4)
    csr = dt.int_image_csr(ints)
    dev, _ = dt.upload_int_image(ints, csr)
    np.testing.assert_array_equal(np.asarray(dev), ints)


def test_upload_gate_and_fallbacks(monkeypatch):
    monkeypatch.setattr(dt, "_CSR_NNZ_BUCKET", 64)
    ints = _sparse_ints(seed=5)
    # knob off → dense transfer, full byte count
    monkeypatch.setenv("CNMF_TPU_CSR_UPLOAD", "0")
    dev, nbytes = dt.upload_int_image(ints)
    assert nbytes == ints.nbytes
    np.testing.assert_array_equal(np.asarray(dev), ints)
    # '1' on CPU → still dense (there is no link to save on CPU)
    monkeypatch.setenv("CNMF_TPU_CSR_UPLOAD", "1")
    import jax

    if jax.default_backend() != "tpu":
        dev, nbytes = dt.upload_int_image(ints)
        assert nbytes == ints.nbytes
    # forced but not a byte win → dense fallback
    monkeypatch.setenv("CNMF_TPU_CSR_UPLOAD", "force")
    dense_img = np.ones((20, 30), dtype=np.uint8)
    dev, nbytes = dt.upload_int_image(dense_img)
    assert nbytes == dense_img.nbytes
    np.testing.assert_array_equal(np.asarray(dev), dense_img)
    # explicit None (stash said "no win") skips recomputation and goes dense
    dev, nbytes = dt.upload_int_image(ints, None)
    assert nbytes == ints.nbytes


def _prepared(tmp_path, name):
    rng = np.random.RandomState(6)
    X = (rng.poisson(2.0, size=(90, 150))
         * (rng.rand(90, 150) < 0.12)).astype(np.float64)
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


def test_pipeline_csr_upload_byte_identical(tmp_path, monkeypatch):
    """Device-norm factorize with the CSR upload forced produces the SAME
    bits as with it off: the scatter reconstructs the identical integer
    image, so every downstream artifact is byte-identical."""
    monkeypatch.setattr(dt, "_CSR_NNZ_BUCKET", 64)
    monkeypatch.setenv("CNMF_TPU_DEVICE_NORM", "1")
    outs = {}
    for knob, name in (("0", "csr_off"), ("force", "csr_on")):
        monkeypatch.setenv("CNMF_TPU_CSR_UPLOAD", knob)
        obj = _prepared(tmp_path, name)
        if knob == "force":
            stash = getattr(obj, "_ints_csr", None)
            assert stash is not None and stash[1] is not None, (
                "prepare should pre-build the CSR components when enabled"
            )
        obj.factorize(verbose=False)
        assert getattr(obj, "_ints_dev", None) is not None
        obj.combine()
        outs[knob] = load_df_from_npz(
            obj.paths["merged_spectra"] % 4
        ).values
    np.testing.assert_array_equal(outs["0"], outs["force"])
