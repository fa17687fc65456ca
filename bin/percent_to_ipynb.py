#!/usr/bin/env python
"""Convert percent-format notebook scripts to .ipynb JSON.

The tutorials in ``notebooks/`` are percent-format Python scripts
(``# %%`` cell markers) so they run headless and diff cleanly; this tool
emits real Jupyter notebooks from them without requiring jupytext.

Usage:  python bin/percent_to_ipynb.py notebooks/*.py [-o outdir]
"""

import argparse
import json
import os


def parse_percent_cells(text):
    """Split percent-format source into (cell_type, source_lines) pairs."""
    cells = []
    kind, buf = None, []

    def flush():
        if kind is not None and any(line.strip() for line in buf):
            # strip the leading comment prefix of markdown cells
            if kind == "markdown":
                lines = [line[2:] if line.startswith("# ") else
                         ("" if line.strip() == "#" else line)
                         for line in buf]
            else:
                lines = list(buf)
            while lines and not lines[0].strip():
                lines.pop(0)
            while lines and not lines[-1].strip():
                lines.pop()
            cells.append((kind, lines))

    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("# %%"):
            flush()
            kind = "markdown" if "[markdown]" in stripped else "code"
            buf = []
        elif kind is not None:
            buf.append(line)
        else:  # content before the first marker becomes a code cell
            kind = "code"
            buf = [line]
    flush()
    return cells


def to_ipynb(cells):
    nb_cells = []
    for kind, lines in cells:
        src = [line + "\n" for line in lines]
        if src:
            src[-1] = src[-1].rstrip("\n")
        cell = {"cell_type": kind, "metadata": {}, "source": src}
        if kind == "code":
            cell["outputs"] = []
            cell["execution_count"] = None
        nb_cells.append(cell)
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("scripts", nargs="+")
    parser.add_argument("-o", "--outdir", default=None,
                        help="output directory (default: next to input)")
    args = parser.parse_args()

    for path in args.scripts:
        with open(path) as f:
            nb = to_ipynb(parse_percent_cells(f.read()))
        out = os.path.splitext(path)[0] + ".ipynb"
        if args.outdir:
            out = os.path.join(args.outdir,
                               os.path.basename(out))
        with open(out, "w") as f:
            json.dump(nb, f, indent=1)
        print(f"{path} -> {out}")


if __name__ == "__main__":
    main()
