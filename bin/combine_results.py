#!/usr/bin/env python
"""Combine two saved SimulationResults files over the union of their
parameter grids (parity: reference bin/combine_results.py)."""

import argparse
import sys


def main() -> None:
    from pyphysim_tpu.simulations import (SimulationResults,
                                          combine_simulation_results)
    from pyphysim_tpu.utils.misc import replace_dict_values

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("first",
                        help="The name of the first SimulationResults file.")
    parser.add_argument("second",
                        help="The name of the second SimulationResults file.")
    parser.add_argument("output", nargs="?",
                        help="Name for the combined results file.")
    args = parser.parse_args()

    first = SimulationResults.load_from_file(args.first)
    second = SimulationResults.load_from_file(args.second)
    union = combine_simulation_results(first, second)

    if args.output is None:
        output = replace_dict_values("combined_results",
                                     union.params.parameters,
                                     filename_mode=True)
    else:
        output = args.output
    name = union.save_to_file(output)
    print(f"Combined results saved to '{name}'")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
