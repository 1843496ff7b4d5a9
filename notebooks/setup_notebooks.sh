#!/bin/bash
# Configure the git filter that keeps notebook outputs out of version
# control (role of the reference's notebooks/setup_notebooks.sh).
cd "$(dirname "${BASH_SOURCE[0]}")"
git config filter.clean_ipynb.clean "$(pwd)/ipynb_strip_output.py"
git config filter.clean_ipynb.smudge cat
git config filter.clean_ipynb.required true
echo "*.ipynb filter=clean_ipynb" > .gitattributes
