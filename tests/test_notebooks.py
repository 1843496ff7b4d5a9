"""Headless notebook execution: both shipped notebooks run end-to-end on
their checkpoint-free fallback paths (tiny random models), so the
interactive workflow (SURVEY §3.5) stays executable without weights."""

import os

import nbformat
import pytest
from nbclient import NotebookClient

NB_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["rewriting-interface",
                                  "reflection-rule-change",
                                  "stats/segmentation-stats",
                                  "stats/face-label-stats",
                                  "stats/attribute-comparison",
                                  "stats/segmentation-stats-dome2tree",
                                  "stats/segmentation-stats-comparison",
                                  "stats/folder-segmentation",
                                  "stats/folder-segmentation-resumable",
                                  "stats/folder-segmentation-sharded",
                                  "stats/ffhq-label-stats",
                                  "stats/dome-area-profile"])
def test_notebook_executes(name, tmp_path):
    def run_once():
        nb = nbformat.read(os.path.join(NB_DIR, f"{name}.ipynb"),
                           as_version=4)
        # force-CPU jax before anything else in the kernel
        setup = nbformat.v4.new_code_cell(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys, os\n"
            f"sys.path.insert(0, "
            f"{os.path.abspath(os.path.join(NB_DIR, '..'))!r})\n"
            f"os.chdir({str(tmp_path)!r})\n")
        nb.cells.insert(0, setup)
        # generous startup_timeout: on a loaded 1-core host the fresh
        # kernel can take minutes to answer its first kernel_info request
        client = NotebookClient(nb, timeout=1800, startup_timeout=600,
                                kernel_name="python3")
        client.execute()  # raises CellExecutionError on any failure
        return nb

    from nbclient.exceptions import DeadKernelError
    try:
        nb = run_once()
    except DeadKernelError:
        # a kernel losing its heartbeat under host load is an
        # environment flake, not a notebook bug (every notebook passes
        # in isolation); one retry keeps the suite green under load
        # while a real in-notebook failure (CellExecutionError) still
        # fails immediately
        nb = run_once()
    ran = [c for c in nb.cells if c.cell_type == "code"
           and c.get("outputs") is not None]
    assert len(ran) >= 4
