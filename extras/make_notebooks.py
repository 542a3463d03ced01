#!/usr/bin/env python
"""Generate the runnable tutorial notebooks (counterpart of the reference's
Tutorials/*.ipynb) into notebooks/.

Each notebook is built from (markdown, code) cell pairs below and is
self-contained: it simulates its own data with cnmf_tpu.simulate (the
reference's tutorials depend on downloads this environment cannot make),
runs the full pipeline, and inspects the results. Sizes are kept small
enough to execute on CPU in a couple of minutes.

Usage:
    python extras/make_notebooks.py             # (re)write the .ipynb files
    python extras/make_notebooks.py --execute   # also execute each one (CPU)
"""

import os
import sys

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "notebooks")

FORCE_CPU = """\
# Tutorial sizes are small — run on CPU so this notebook works anywhere.
# On a TPU host, drop these two lines to run on the accelerator.
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")"""


def nb(cells):
    notebook = nbf.v4.new_notebook()
    notebook.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    out = []
    for kind, src in cells:
        if kind == "md":
            out.append(nbf.v4.new_markdown_cell(src))
        else:
            out.append(nbf.v4.new_code_cell(src))
    notebook.cells = out
    return notebook


SIMULATED = [
    ("md", """\
# cnmf-tpu: simulated data end-to-end

Counterpart of the reference's *analyze simulated example data* tutorial.
We simulate counts with planted identity + activity programs, run the full
five-stage pipeline (`prepare → factorize → combine → k_selection_plot →
consensus`), and check that the recovered programs match the planted ones.

The whole restart grid runs as batched device programs — no worker
scheduling needed."""),
    ("code", FORCE_CPU),
    ("code", """\
import tempfile
import numpy as np
import pandas as pd

from cnmf_tpu import cNMF
from cnmf_tpu.io.h5ad import write_h5ad
from cnmf_tpu.simulate import simulate_counts

workdir = tempfile.mkdtemp(prefix="cnmf_tpu_sim_")
adata, true_usage, true_spectra = simulate_counts(
    n_cells=600, n_genes=1500, n_identities=5, n_activities=1,
    n_markers_per_program=60, seed=0,
)
counts_fn = f"{workdir}/simulated_counts.h5ad"
write_h5ad(counts_fn, adata)
adata.X.shape, true_usage.shape"""),
    ("md", """\
## Prepare → factorize → combine

`prepare` selects overdispersed genes and lays out the (K, restart, seed)
grid; `factorize` runs **all restarts for each K as one batched device
program**; `combine` stacks the per-iteration spectra."""),
    ("code", """\
obj = cNMF(output_dir=workdir, name="simulated")
obj.prepare(counts_fn=counts_fn, components=[4, 5, 6, 7, 8], n_iter=20,
            seed=14, num_highvar_genes=600)
obj.factorize()
obj.combine()"""),
    ("md", """\
## Select K

Stability (silhouette over restart spectra) vs reconstruction error.
Stability alone always favors small K (fewer programs are easier to
reproduce), so — as in the reference tutorial — pick the largest K that
still buys a real drop in prediction error before the curve flattens. The
planted structure has 6 programs (5 identities + 1 activity)."""),
    ("code", """\
stats = obj.k_selection_plot(close_fig=True)
stats"""),
    ("code", """\
# smallest K after which the error improvement falls under 2%
err = stats.set_index(stats.k.astype(int)).prediction_error
improvement = -err.diff().shift(-1) / err
best_k = int(improvement[improvement < 0.02].index[0])
print("selected K =", best_k)"""),
    ("md", """\
## Consensus

Density-filter outlier spectra, cluster across restarts, take cluster
medians, refit usages — then load the results."""),
    ("code", """\
obj.consensus(k=best_k, density_threshold=0.1, show_clustering=True,
              close_clustergram_fig=True)
usage, spectra_scores, spectra_tpm, top_genes = obj.load_results(
    K=best_k, density_threshold=0.1)
top_genes.head()"""),
    ("md", """\
## Score recovery against the planted programs

Each planted program should be captured by one recovered GEP (high max
correlation between true and recovered usage columns)."""),
    ("code", """\
corr = np.corrcoef(true_usage.values.T, usage.values.T)[
    :true_usage.shape[1], true_usage.shape[1]:]
best = corr.max(axis=1)
print(pd.Series(best, index=true_usage.columns).round(3))
assert (best > 0.8).all(), "every planted program should be recovered"
"""),
]


PBMC = [
    ("md", """\
# cnmf-tpu: PBMC-style workflow (10x-like data, filtering, worker CLI)

Counterpart of the reference's *analyze PBMC example data* tutorial. The
reference downloads a 2,700-cell 10x dataset; this environment cannot, so
we simulate a PBMC-like matrix and focus on the workflow itself: QC
filtering with `Preprocess`, the five pipeline stages, and (optionally)
worker-sharded factorization for CLI parity."""),
    ("code", FORCE_CPU),
    ("code", """\
import tempfile
import numpy as np
import pandas as pd

from cnmf_tpu import Preprocess, cNMF
from cnmf_tpu.io.h5ad import write_h5ad
from cnmf_tpu.simulate import simulate_counts

workdir = tempfile.mkdtemp(prefix="cnmf_tpu_pbmc_")
adata, _, _ = simulate_counts(n_cells=500, n_genes=1200, n_identities=6,
                              seed=3)
adata.X.shape"""),
    ("md", """\
## QC filtering

Gene/cell floors and a mitochondrial-fraction ceiling, matching the
reference's `Preprocess.filter_adata`. (For real 10x data, load with
`cnmf_tpu.io.read_10x_mtx("filtered_gene_bc_matrices/hg19/")`.)"""),
    ("code", """\
pp = Preprocess(random_seed=14)
filtered = pp.filter_adata(adata, min_cells_per_gene=3,
                           min_counts_per_cell=200)
counts_fn = f"{workdir}/pbmc_filtered.h5ad"
write_h5ad(counts_fn, filtered)
filtered.X.shape"""),
    ("md", "## The five stages"),
    ("code", """\
obj = cNMF(output_dir=workdir, name="pbmc")
obj.prepare(counts_fn=counts_fn, components=[5, 6, 7], n_iter=15, seed=14,
            num_highvar_genes=500)
obj.factorize()
obj.combine()
stats = obj.k_selection_plot(close_fig=True)
stats"""),
    ("code", """\
k = int(stats.loc[stats.silhouette.idxmax(), "k"])
obj.consensus(k=k, density_threshold=0.1, show_clustering=True,
              close_clustergram_fig=True)
usage, scores, tpm, top_genes = obj.load_results(K=k, density_threshold=0.1)
usage.head()"""),
    ("md", """\
## Worker-sharded factorize (CLI parity)

On TPU one batched call replaces the reference's worker pool, but the
round-robin worker contract is kept — the same spectra land on disk no
matter how the grid is split:

```bash
cnmf-tpu factorize --output-dir $DIR --name pbmc --worker-index 0 --total-workers 2
cnmf-tpu factorize --output-dir $DIR --name pbmc --worker-index 1 --total-workers 2
```

or in Python:"""),
    ("code", """\
obj2 = cNMF(output_dir=workdir, name="pbmc")
obj2.factorize(worker_i=0, total_workers=2, verbose=False)
obj2.factorize(worker_i=1, total_workers=2, verbose=False)
print("worker-sharded rerun wrote the same per-iteration files")"""),
]


BATCH = [
    ("md", """\
# cnmf-tpu: Harmony batch correction + CITE-seq preprocessing

Counterpart of the reference's *batch-effect correction (Baron et al.)*
tutorial: `Preprocess.preprocess_for_cnmf` normalizes, selects seurat_v3
HVGs, PCA-embeds, runs Harmony (the JAX implementation replacing
harmonypy), applies the mixture-of-experts ridge correction to the
EXPRESSION matrix, and writes the three files `prepare` consumes."""),
    ("code", FORCE_CPU),
    ("code", """\
import tempfile
import numpy as np
import pandas as pd

from cnmf_tpu import Preprocess, cNMF
from cnmf_tpu.io.anndata_lite import AnnData
from cnmf_tpu.simulate import simulate_counts

workdir = tempfile.mkdtemp(prefix="cnmf_tpu_batch_")

# simulate two batches with a multiplicative batch effect
adata, _, _ = simulate_counts(n_cells=400, n_genes=900, n_identities=4,
                              seed=5)
rng = np.random.RandomState(7)
batch = np.where(rng.rand(adata.X.shape[0]) < 0.5, "donor_a", "donor_b")
effect = np.where(batch == "donor_b", 1.0, 0.0)[:, None]
X = np.asarray(adata.X) * (1.0 + effect * rng.lognormal(0, 0.15, adata.X.shape[1])[None, :])
adata = AnnData(np.round(X), obs=adata.obs.assign(Sample=batch),
                var=adata.var)
pd.Series(batch).value_counts()"""),
    ("md", """\
## Normalize + Harmony-correct

`harmony_vars` triggers: library-size normalization → seurat_v3 HVGs →
std-scale with a quantile ceiling → PCA → Harmony soft k-means with the
diversity penalty → MOE ridge correction applied to X (not just the PCs),
clipped at zero."""),
    ("code", """\
pp = Preprocess(random_seed=14)
corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
    adata, harmony_vars=["Sample"], n_top_rna_genes=300,
    save_output_base=f"{workdir}/baron")
corrected.X.shape, len(hvgs)"""),
    ("md", """\
## Feed the corrected matrices into the pipeline

`prepare` takes the corrected HVG matrix as counts, the TP10K matrix as
the TPM source, and the HVG list — exactly the reference's wiring."""),
    ("code", """\
obj = cNMF(output_dir=workdir, name="baron")
obj.prepare(counts_fn=f"{workdir}/baron.Corrected.HVG.Varnorm.h5ad",
            tpm_fn=f"{workdir}/baron.TP10K.h5ad",
            genes_file=f"{workdir}/baron.Corrected.HVGs.txt",
            components=[4, 5], n_iter=10, seed=14)
obj.factorize()
obj.combine()
obj.consensus(k=4, density_threshold=2.0, show_clustering=False)
usage, scores, tpm, top = obj.load_results(K=4, density_threshold=2.0)
usage.head()"""),
    ("md", """\
## CITE-seq (RNA + ADT)

With antibody-capture features, `preprocess_for_cnmf` splits RNA/ADT,
normalizes each separately and hstacks the ADT panel back onto the TP10K
matrix so ADT features appear in the program spectra:

```python
# single AnnData with a feature-type column:
corrected, tp10k, hvgs = pp.preprocess_for_cnmf(
    adata, feature_type_col="feature_types", harmony_vars=["Sample"])
# or an [RNA, ADT] pair:
corrected, tp10k, hvgs = pp.preprocess_for_cnmf([adata_rna, adata_adt])
```"""),
]


R_VIGNETTE = [
    ("md", """\
# cnmf-tpu from R (or any external tool): the CLI workflow

Counterpart of the reference's `Tutorials/R_vignette.Rmd`
(reference R_vignette.Rmd:107-167): an R user exports their Seurat object
as a 10x-style `matrix.mtx` directory, drives the pipeline through shell
commands with `system()`, and reads the tab-separated result files back
with `read.table`. Everything below mirrors that flow — each `run(...)`
cell is exactly the command string the R vignette builds with `paste(...)`
and passes to `system()`; swap `python -m cnmf_tpu.cli` for the `cnmf`
console script if the package is installed."""),
    ("code", FORCE_CPU),
    ("md", """\
## Export a counts matrix as a 10x mtx directory

(Stand-in for Seurat's `writeMM(counts, 'matrix.mtx')` +
`write.table(rownames/colnames)` — we simulate counts instead of
downloading the vignette's dataset.)"""),
    ("code", """\
import os
import tempfile

import numpy as np
import pandas as pd
import scipy.io
import scipy.sparse as sp

from cnmf_tpu.simulate import simulate_counts

data_dir = tempfile.mkdtemp(prefix="cnmf_tpu_rvig_")
filtered_dir = os.path.join(data_dir, "filtered")
os.makedirs(filtered_dir, exist_ok=True)

# 4 identity + 1 activity program = 5 planted programs (matches the K=5
# consensus below)
adata, usage_true, spectra_true = simulate_counts(
    n_cells=500, n_genes=800, n_identities=4, n_activities=1, seed=11)
X = sp.csr_matrix(np.asarray(adata.X))

# 10x layout: genes x cells matrix.mtx + genes.tsv + barcodes.tsv
scipy.io.mmwrite(os.path.join(filtered_dir, "matrix.mtx"), X.T)
pd.DataFrame({0: adata.var.index, 1: adata.var.index}).to_csv(
    os.path.join(filtered_dir, "genes.tsv"),
    sep="\\t", header=False, index=False)
pd.Series(adata.obs.index).to_csv(
    os.path.join(filtered_dir, "barcodes.tsv"),
    sep="\\t", header=False, index=False)
sorted(os.listdir(filtered_dir))"""),
    ("md", """\
## Drive the five stages through the shell

The R vignette builds each command with `paste(...)` and calls
`system(cmd)`; `run` below is the same thing from Python."""),
    ("code", """\
import subprocess
import sys

runname = "example_cNMF"

def run(cmd):
    print("$", cmd)
    # CNMF_TPU_PLATFORM is applied via jax.config.update inside the CLI —
    # a plain JAX_PLATFORMS env var loses to sitecustomize presets (e.g.
    # remote-device plugins), so this is the reliable way to pin CPU
    subprocess.run(
        [sys.executable, "-m", "cnmf_tpu.cli"] + cmd.split(),
        check=True, env={**os.environ, "CNMF_TPU_PLATFORM": "cpu"})

run(f"prepare --output-dir {data_dir} --name {runname} "
    f"-c {filtered_dir}/matrix.mtx --max-nmf-iter 2000 "
    f"-k 4 5 6 7 --n-iter 10")"""),
    ("code", """\
# one worker here; distribute with --worker-index i --total-workers N
run(f"factorize --output-dir {data_dir} --name {runname} "
    f"--worker-index 0 --total-workers 1")
run(f"combine --output-dir {data_dir} --name {runname}")
run(f"k_selection_plot --output-dir {data_dir} --name {runname}")"""),
    ("md", """\
## Inspect the K-selection plot

(The Rmd embeds the PNG with `![Alt text](...k_selection.png)`.)"""),
    ("code", """\
import matplotlib.pyplot as plt

png = os.path.join(data_dir, runname, f"{runname}.k_selection.png")
fig, ax = plt.subplots(figsize=(7, 4), dpi=110)
ax.imshow(plt.imread(png)); ax.axis("off"); plt.show()"""),
    ("code", """\
run(f"consensus --output-dir {data_dir} --name {runname} "
    f"--components 5 --local-density-threshold 0.1 --show-clustering")"""),
    ("md", """\
## Read the results back, R-style

The vignette finishes with
`read.table('...usages.k_7.dt_0_1.consensus.txt', sep='\\t', row.names=1,
header=TRUE)`; the same tab-separated files land here."""),
    ("code", """\
usage = pd.read_csv(
    os.path.join(data_dir, runname,
                 f"{runname}.usages.k_5.dt_0_1.consensus.txt"),
    sep="\\t", index_col=0)
usage_norm = usage.div(usage.sum(axis=1), axis=0)
gep_scores = pd.read_csv(
    os.path.join(data_dir, runname,
                 f"{runname}.gene_spectra_score.k_5.dt_0_1.txt"),
    sep="\\t", index_col=0).T
print("top genes per GEP:")
pd.DataFrame({c: gep_scores[c].nlargest(5).index for c in gep_scores})"""),
    ("code", """\
# planted-program recovery check: each true identity program should be
# captured by one GEP (high max correlation)
cors = np.corrcoef(usage_norm.values.T, usage_true.values.T)[:5, 5:]
print("max |r| per planted program:", np.abs(cors).max(axis=0).round(2))
assert np.abs(cors).max(axis=0).min() > 0.5"""),
]


NOTEBOOKS = {
    "analyze_simulated_example.ipynb": SIMULATED,
    "analyze_pbmc_example.ipynb": PBMC,
    "batch_correction_example.ipynb": BATCH,
    "cli_from_R_example.ipynb": R_VIGNETTE,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    # --only NAME regenerates/executes a single notebook without clobbering
    # the other (already-executed) ones
    names = list(NOTEBOOKS)
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
        if only not in NOTEBOOKS:
            raise SystemExit(f"unknown notebook {only!r}; have {names}")
        names = [only]
    for name in names:
        path = os.path.join(OUT, name)
        nbf.write(nb(NOTEBOOKS[name]), path)
        print("wrote", os.path.normpath(path))

    if "--execute" in sys.argv:
        from nbclient import NotebookClient

        for name in names:
            path = os.path.join(OUT, name)
            print("executing", name, "...")
            notebook = nbf.read(path, as_version=4)
            NotebookClient(notebook, timeout=1200).execute()
            nbf.write(notebook, path)
            print("  ok")


if __name__ == "__main__":
    main()
