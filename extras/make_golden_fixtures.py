#!/usr/bin/env python
"""Generate golden regression fixtures (counterpart of the reference's
Extras/prepare_unittest_simulation.ipynb): run the pipeline on simulated data
in float64 on CPU and store the merged spectra + consensus outputs that
tests/test_golden.py replays and compares at SSE < 1e-4.

Run from the repo root:  python extras/make_golden_fixtures.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmf_tpu import cNMF, write_h5ad  # noqa: E402
from cnmf_tpu.simulate import simulate_counts  # noqa: E402
from cnmf_tpu.io.dataframe import load_df_from_npz, save_df_to_npz  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens",
)
K = 6
DT = "0_5"

CONFIG = dict(n_cells=300, n_genes=400, n_identities=5, n_activities=1,
              n_markers_per_program=40, seed=7)
PREPARE = dict(components=[K], n_iter=10, seed=14, num_highvar_genes=200)


def main():
    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    workdir = tempfile.mkdtemp()
    adata, _, _ = simulate_counts(**CONFIG)
    counts_fn = os.path.join(workdir, "counts.h5ad")
    write_h5ad(counts_fn, adata)

    obj = cNMF(output_dir=workdir, name="golden", compute_dtype=np.float64)
    obj.prepare(counts_fn=counts_fn, **PREPARE)
    obj.factorize(verbose=False)
    obj.combine()
    obj.consensus(k=K, density_threshold=0.5, show_clustering=False)

    for key in ["merged_spectra"]:
        df = load_df_from_npz(obj.paths[key] % K)
        save_df_to_npz(df, os.path.join(GOLDEN_DIR, f"{key}.k_{K}.df.npz"))
    for key in ["consensus_spectra", "consensus_usages",
                "gene_spectra_tpm", "gene_spectra_score", "starcat_spectra"]:
        df = load_df_from_npz(obj.paths[key] % (K, DT))
        save_df_to_npz(df, os.path.join(GOLDEN_DIR, f"{key}.k_{K}.dt_{DT}.df.npz"))
    print(f"goldens written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
