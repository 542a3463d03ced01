#!/usr/bin/env python
"""Generate golden regression fixtures (counterpart of the reference's
Extras/prepare_unittest_simulation.ipynb): run prepare on simulated data in
float64 on CPU, factorize every (K, iter, seed) replicate with **sklearn's
``non_negative_factorization`` itself** — NOT this repo's solver — then run
combine + consensus and store the merged spectra + consensus outputs that
tests/test_golden.py replays and compares at SSE < 1e-4.

Anchoring the merged spectra outside the codebase (the reference's own
strategy, test_reproducibility.py:85-89) means the committed goldens cannot
ratify a systematic deviation of this repo's solver: the consensus goldens
derive from sklearn-produced factors, and test_golden.py's live-factorize
test is a true pipeline-level sklearn parity check.

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


def sklearn_factorize(obj):
    """Write every per-iteration spectra file with sklearn's NMF (the engine
    the reference's factorize calls, reference cnmf.py:661-674) driven by the
    run's own on-disk contract: the replicate seed grid + YAML solver kwargs
    prepare wrote. Zero repo solver code touches the factors."""
    import pandas as pd
    import yaml
    from sklearn.decomposition import non_negative_factorization

    from cnmf_tpu.io.h5ad import read_h5ad

    params = load_df_from_npz(obj.paths["nmf_replicate_parameters"])
    kwargs = yaml.load(
        open(obj.paths["nmf_run_parameters"]), Loader=yaml.FullLoader
    )
    norm = read_h5ad(obj.paths["normalized_counts"])
    X = norm.X
    if hasattr(X, "toarray"):
        X = X.toarray()
    X = np.asarray(X, dtype=np.float64)
    genes = norm.var.index
    for row in params.itertuples():
        k, it = int(row.n_components), int(row.iter)
        run_kwargs = dict(kwargs)
        run_kwargs["n_components"] = k
        run_kwargs["random_state"] = int(row.nmf_seed)
        _w, h, _n = non_negative_factorization(X, **run_kwargs)
        spectra = pd.DataFrame(h, index=np.arange(1, k + 1), columns=genes)
        save_df_to_npz(spectra, obj.paths["iter_spectra"] % (k, it))


def main():
    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    workdir = tempfile.mkdtemp()
    adata, _, _ = simulate_counts(**CONFIG)
    counts_fn = os.path.join(workdir, "counts.h5ad")
    write_h5ad(counts_fn, adata)

    obj = cNMF(output_dir=workdir, name="golden", compute_dtype=np.float64)
    obj.prepare(counts_fn=counts_fn, **PREPARE)
    sklearn_factorize(obj)
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
