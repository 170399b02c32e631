"""Thesis figure styling — parity with the reference's global plot theme.

Parity: ``/root/reference/src/nplot.py:16-45`` — seaborn ``darkgrid``,
Computer Modern serif text at ``font.size: 22``, Type-42 font embedding,
the named accent colors, and the ``icefire`` diverging palette for
heatmaps.

One intentional deviation: the reference hands all text to a system LaTeX
(``text.usetex: True`` + ``lmodern``/``amsmath`` preamble). This
environment ships no TeX binary, so the same look is produced with
matplotlib's built-in Computer Modern *mathtext* renderer
(``mathtext.fontset: "cm"`` + a serif family) — identical glyphs for math,
no external process, and the figures stay reproducible on any host.

Styling is opt-in so headless smoke tests keep matplotlib's defaults:
call :func:`use_thesis_style` (the toy CLI's ``--style thesis`` flag does)
before creating figures.
"""

from __future__ import annotations

from enum import Enum

import matplotlib as mpl


class Colors(str, Enum):
    """Accent palette (reference ``nplot.py:35-40``)."""

    paleblue = "#8888FF"
    deepblue = "#375E97"
    darkorange = "#FB6542"
    yellow = "#FFBB00"
    darkgray = "#333"


#: rcParams shared by both the seaborn and the fallback path. The
#: reference sets usetex + CM Roman + size 22 (``nplot.py:21-32``); the
#: mathtext equivalents are documented in the module docstring.
_THESIS_RC = {
    "font.family": "serif",
    "font.serif": ["cmr10", "Computer Modern Roman", "DejaVu Serif"],
    "mathtext.fontset": "cm",
    "axes.formatter.use_mathtext": True,   # cmr10 lacks a plain minus sign
    "pdf.fonttype": 42,
    "ps.fonttype": 42,
    "font.size": 22,
}


_ACTIVE = False


def is_active() -> bool:
    """True once :func:`use_thesis_style` has been applied."""
    return _ACTIVE


def use_thesis_style(font_size: int | None = None) -> None:
    """Activate the reference's global figure theme process-wide.

    seaborn ``darkgrid`` + the rcParams above. Falls back to a hand-rolled
    darkgrid (the exact axes/grid colors seaborn uses) when seaborn is not
    importable, so the style never becomes a hard dependency.
    """
    try:
        import seaborn as sns
        sns.set_style("darkgrid")
    except ImportError:
        mpl.rcParams.update({
            "axes.facecolor": "#EAEAF2",
            "axes.edgecolor": "white",
            "axes.grid": True,
            "grid.color": "white",
            "axes.axisbelow": True,
            "xtick.color": ".15",
            "ytick.color": ".15",
        })
    rc = dict(_THESIS_RC)
    if font_size is not None:
        rc["font.size"] = font_size
    mpl.rcParams.update(rc)
    global _ACTIVE
    _ACTIVE = True


def get_palette():
    """Diverging heatmap palette (reference ``nplot.py:43-45``).

    seaborn's ``icefire`` as a colormap when available; otherwise
    matplotlib's perceptually similar built-in ``coolwarm`` reversed
    around the same light center.
    """
    try:
        import seaborn as sns
        return sns.color_palette("icefire", as_cmap=True)
    except ImportError:
        return mpl.colormaps["coolwarm"]
