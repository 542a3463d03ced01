#!/usr/bin/env python
"""One-shot pipeline driver (counterpart of the reference's
Extras/run_parallel.py:40-66, minus GNU parallel — the restart grid is one
batched device program, so there is nothing to shell out to).

prepare → factorize → combine → k_selection_plot, then optionally delete the
per-iteration spectra files.

Example:
    python extras/run_pipeline.py --output-dir ./results --name example \
        -c counts.txt -k 5 6 7 8 9 10 -n 100 --numgenes 2000 --seed 14
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output-dir", type=str, default=".")
    parser.add_argument("--name", type=str, default="cNMF")
    parser.add_argument("-c", "--counts", type=str, required=True)
    parser.add_argument("-k", "--components", type=int, nargs="+", required=True)
    parser.add_argument("-n", "--n-iter", type=int, default=100)
    parser.add_argument("--numgenes", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--beta-loss", type=str, default="frobenius")
    parser.add_argument("--keep-individual-iterations", action="store_true",
                        help="Keep the per-(K, iter) spectra files after combine")
    args = parser.parse_args()

    # single-process pipeline: prepare's h5ad writes can safely overlap the
    # factorize device programs (reads join the writer; see CLAUDE.md)
    os.environ.setdefault("CNMF_TPU_ASYNC_WRITES", "1")

    from cnmf_tpu import cNMF

    obj = cNMF(output_dir=args.output_dir, name=args.name)
    obj.prepare(counts_fn=args.counts, components=args.components,
                n_iter=args.n_iter, seed=args.seed,
                num_highvar_genes=args.numgenes, beta_loss=args.beta_loss)
    obj.factorize()
    obj.combine()
    obj.k_selection_plot(close_fig=True)
    obj.flush_writes()

    if not args.keep_individual_iterations:
        pattern = os.path.join(
            args.output_dir, args.name, "cnmf_tmp",
            f"{args.name}.spectra.k_*.iter_*.df.npz",
        )
        for fn in glob.glob(pattern):
            os.remove(fn)


if __name__ == "__main__":
    main()
