#!/usr/bin/env python
"""Explode a saved SimulationResults file back into per-variation partial
results files (parity: reference bin/split_into_partial_results.py)."""

import argparse
import os
import sys


def main() -> None:
    from pyphysim_tpu.simulations import Result, SimulationResults

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_file",
                        help="The name of the SimulationResults file.")
    parser.add_argument("-o", "--output_folder", default="partial_results",
                        help="Folder for the partial results files.")
    args = parser.parse_args()

    results = SimulationResults.load_from_file(args.results_file)
    os.makedirs(args.output_folder, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.results_file))[0]

    unpacked = results.params.get_unpacked_params_list()
    for i, var_params in enumerate(unpacked):
        partial = SimulationResults()
        partial.set_parameters(var_params)
        for name in results.get_result_names():
            entries = results[name]
            if i < len(entries):
                partial.append_result(entries[i])
        rep_entry = None
        if "elapsed_time" in results:
            rep_entry = results["elapsed_time"][i] \
                if i < len(results["elapsed_time"]) else None
        partial.current_rep = (rep_entry.num_updates
                               if rep_entry is not None else 0)
        filename = os.path.join(args.output_folder,
                                f"{base}_unpack_{i:02d}.pickle")
        partial.save_to_file(filename)
        print(f"Saved '{filename}'")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
