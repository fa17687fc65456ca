#!/usr/bin/env python
"""Tabulate the minimum chordal distance of previously saved codebooks.

Counterpart of the reference's
``apps/codebooks/minimum_distance_all_codebooks.py``: loads every
``codebook_<K>_precoders_in_G(<Nt>,<Ns>).npz`` produced by
``apps/find_codebook.py`` and prints a markdown-style distance row per
codebook size.

Run: python apps/codebooks/minimum_distance_all_codebooks.py \
        [--Nt 2 --Ns 1 --K 8:65:4] [--dir codebook_results]
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--Nt", type=int, default=2)
    parser.add_argument("--Ns", type=int, default=1)
    parser.add_argument("--K", default="8:65:4",
                        help="range expression start:stop:step")
    parser.add_argument("--dir", default="codebook_results")
    args = parser.parse_args()

    start, stop, step = (int(x) for x in args.K.split(":"))
    template = os.path.join(
        args.dir, "codebook_{0}_precoders_in_G({1},{2}).npz")

    row = ""
    for k in range(start, stop, step):
        path = template.format(k, args.Nt, args.Ns)
        try:
            results = np.load(path)
            row += " | {:0.4f}".format(float(results["best_dist"]))
        except IOError:
            row += " | ------"
    print(row + " |")


if __name__ == "__main__":
    main()
