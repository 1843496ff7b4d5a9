#!/usr/bin/env python
"""git clean-filter: strip outputs / execution counts from .ipynb on stdin
unless the notebook metadata sets {"git": {"keep_output": true}}.

Clean-room equivalent of the reference's notebooks/ipynb_drop_output.py
(same role: keep huge cell outputs out of version control).  Install with
notebooks/setup_notebooks.sh."""

import json
import sys


def strip(nb: dict) -> dict:
    if nb.get("metadata", {}).get("git", {}).get("keep_output"):
        return nb
    for cell in nb.get("cells", []):
        if cell.get("cell_type") == "code":
            cell["outputs"] = []
            cell["execution_count"] = None
    return nb


if __name__ == "__main__":
    json.dump(strip(json.load(sys.stdin)), sys.stdout, indent=1,
              sort_keys=True)
    sys.stdout.write("\n")
