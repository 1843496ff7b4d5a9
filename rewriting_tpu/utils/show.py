"""Notebook HTML layout helper.

Behavioral equivalent of the reference's show module (utils/show.py): lay
out nested arrays of displayable things (PIL images, numpy images, text,
widgets) as HTML rows and columns in Jupyter.  ``show(a, [b, c])`` renders
a as one block and [b, c] as a row.  Outside IPython it degrades to
returning the HTML string."""

from __future__ import annotations

import html as _html

import numpy as np

from . import renormalize


def _to_html(obj) -> str:
    # widgets from the labwidget framework render themselves
    if hasattr(obj, "_repr_html_"):
        return obj._repr_html_()
    try:
        import PIL.Image
        if isinstance(obj, PIL.Image.Image):
            return f'<img src="{renormalize.as_url(obj)}">'
    except ImportError:
        pass
    if isinstance(obj, np.ndarray):
        if obj.ndim == 3:  # assume zc image
            return f'<img src="{renormalize.as_url(obj)}">'
        return f"<pre>{_html.escape(np.array2string(obj, precision=3))}</pre>"
    if isinstance(obj, dict):
        rows = "".join(
            f"<tr><td style='text-align:right;padding:0 8px'>"
            f"{_html.escape(str(k))}</td><td>{_to_html(v)}</td></tr>"
            for k, v in obj.items())
        return f"<table>{rows}</table>"
    if isinstance(obj, (list, tuple)):
        cells = "".join(
            f"<div style='display:inline-block;vertical-align:top;"
            f"margin:2px'>{_to_html(o)}</div>" for o in obj)
        return f"<div>{cells}</div>"
    return f"<div>{_html.escape(str(obj))}</div>"


def html(*args) -> str:
    """Build the HTML string for a sequence of blocks."""
    return "".join(f"<div style='margin:2px'>{_to_html(a)}</div>"
                   for a in args)


def show(*args):
    """Display blocks in Jupyter; returns the HTML string otherwise."""
    out = html(*args)
    try:
        from IPython.display import display, HTML
        display(HTML(out))
        return None
    except ImportError:
        return out


def blocks(items):
    """Vertical stack."""
    return list(items)


def rows(items):
    """Horizontal row."""
    return [list(items)]
