#!/usr/bin/env python
"""Regenerate docs/api.md from docstrings.

Usage: python extras/gen_api_docs.py  (writes docs/api.md in place)
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODULES = [
    "cnmf_tpu.pipeline.cnmf",
    "cnmf_tpu.preprocess",
    "cnmf_tpu.harmony",
    "cnmf_tpu.simulate",
    "cnmf_tpu.ops.nmf",
    "cnmf_tpu.ops.init",
    "cnmf_tpu.ops.kmeans",
    "cnmf_tpu.ops.kstats",
    "cnmf_tpu.ops.distance",
    "cnmf_tpu.ops.silhouette",
    "cnmf_tpu.ops.ols",
    "cnmf_tpu.ops.stats",
    "cnmf_tpu.ops.normalize",
    "cnmf_tpu.ops.hvg_seurat",
    "cnmf_tpu.ops.pca",
    "cnmf_tpu.ops.pallas_mu",
    "cnmf_tpu.pipeline.solvers",
    "cnmf_tpu.pipeline.paths",
    "cnmf_tpu.pipeline.plots",
    "cnmf_tpu.parallel.mesh",
    "cnmf_tpu.io.dataframe",
    "cnmf_tpu.io.h5ad",
    "cnmf_tpu.io.tenx",
    "cnmf_tpu.io.loaders",
    "cnmf_tpu.io.anndata_lite",
    "cnmf_tpu.native",
    "cnmf_tpu.cli",
]


def first_para(doc):
    if not doc:
        return ""
    return inspect.cleandoc(doc).split("\n\n")[0]


def signature_of(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def main():
    out = ["# API reference", "",
           "Generated from docstrings (`python extras/gen_api_docs.py`).", ""]
    for modname in MODULES:
        mod = importlib.import_module(modname)
        out.append(f"## `{modname}`")
        out.append("")
        mdoc = first_para(mod.__doc__)
        if mdoc:
            out.append(mdoc)
            out.append("")
        for name in sorted(vars(mod)):
            if name.startswith("_"):
                continue
            obj = vars(mod)[name]
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue
            sig = signature_of(obj.__init__ if inspect.isclass(obj)
                               and not hasattr(obj, "_fields") else obj)
            if inspect.isclass(obj) and hasattr(obj, "_fields"):
                sig = "(" + ", ".join(obj._fields) + ")"
            elif inspect.isclass(obj):
                sig = sig.replace("(self, ", "(").replace("(self)", "()")
            out.append(f"### `{name}{sig}`")
            out.append("")
            doc = first_para(obj.__doc__)
            if doc:
                out.append(doc)
                out.append("")
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out).rstrip() + "\n")
    print(f"wrote {os.path.normpath(path)} ({len(out)} lines)")


if __name__ == "__main__":
    main()
