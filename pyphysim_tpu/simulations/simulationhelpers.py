"""'Do what I mean' simulation launchers.

Behavioral counterpart of the reference
``pyphysim/simulations/simulationhelpers.py:22-224``: pick the execution
mode automatically, run one or many runners, and print result locations.

Mode selection (TPU-native): the reference probed for a live IPython
cluster; here the equivalent of 'parallel hardware is available' is a
multi-device jax backend — if more than one device is visible the sweep's
repetition batches are sharded over a mesh, otherwise the single-device
path runs. A ``-i/--index`` CLI argument always forces single-variation
serial mode (cluster job splitting).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from .runner import SimulationRunner

__all__ = ["simulate_do_what_i_mean"]


def simulate_do_what_i_mean(
        runner_or_list: Union[SimulationRunner, Sequence[SimulationRunner]],
        folder: Optional[str] = None) -> None:
    """Run simulation(s) in the most appropriate way.

    Parameters
    ----------
    runner_or_list : SimulationRunner or list of SimulationRunner
        The simulation runner(s) to execute.
    folder : str, optional
        Ignored on the TPU build (the reference appended it to workers'
        sys.path so pickled runners could import user code; an SPMD program
        has no such requirement). Accepted for call-site compatibility.
    """
    if isinstance(runner_or_list, SimulationRunner):
        _simulate_single(runner_or_list)
    else:
        for runner in runner_or_list:
            _simulate_single(runner)


def _simulate_single(runner: SimulationRunner) -> None:
    import jax
    index = runner.command_line_args.index
    if index is not None:
        runner.simulate(param_variation_index=index)
        return

    if jax.device_count() > 1:
        runner.simulate_in_parallel()
    else:
        runner.simulate()

    filename = runner.results_base_filename
    if filename is not None:
        print(f"Results saved to '{runner._get_results_filename()}'")
