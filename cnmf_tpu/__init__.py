"""cnmf_tpu — a TPU-native consensus non-negative matrix factorization framework.

Re-implements the capabilities of cNMF (consensus NMF for inferring gene
expression programs from scRNA-seq; see reference src/cnmf/cnmf.py) as batched
JAX/XLA device programs: the full ``n_iter`` restarts × K grid of NMF runs is a
single vmapped/sharded computation instead of worker-indexed CPU jobs, and the
consensus stage (local-density filtering, KMeans, median spectra, NNLS refits,
silhouette/error K-selection) runs on device as well.

Public API mirrors the reference (reference cnmf.py:265-1210):

    from cnmf_tpu import cNMF, Preprocess
"""

from cnmf_tpu.version import __version__
from cnmf_tpu.pipeline.cnmf import cNMF
from cnmf_tpu.io.dataframe import save_df_to_npz, save_df_to_text, load_df_from_npz
from cnmf_tpu.io.anndata_lite import AnnData
from cnmf_tpu.io.h5ad import read_h5ad, write_h5ad
from cnmf_tpu.preprocess import Preprocess

__all__ = [
    "cNMF",
    "Preprocess",
    "AnnData",
    "read_h5ad",
    "write_h5ad",
    "save_df_to_npz",
    "save_df_to_text",
    "load_df_from_npz",
    "__version__",
]
