"""Preprocessing / batch correction layer (reference preprocess.py:41-473).

Round-1 scope: cell/gene filtering and library-size normalization; the
Harmony-style batch correction, seurat_v3 HVG selection and CITE-seq handling
are filled in by cnmf_tpu.harmony and later commits this round.
"""

from __future__ import annotations

import numpy as np

from cnmf_tpu.io.anndata_lite import AnnData


class Preprocess:
    def __init__(self, random_seed: int = 14):
        self.random_seed = random_seed
        np.random.seed(random_seed)

    def filter_adata(self, adata: AnnData, **kwargs) -> AnnData:
        raise NotImplementedError("implemented in a later commit this round")
