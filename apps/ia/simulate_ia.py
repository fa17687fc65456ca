#!/usr/bin/env python
"""3-user MIMO interference channel: IA solver sum-capacity sweep.

TPU-native counterpart of the reference's ``apps/ia/simulate_ia.py``.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from pyphysim_tpu.channels import MultiUserChannelMatrix
from pyphysim_tpu.ia import (AlternatingMinIASolver, ClosedFormIASolver,
                             MaxSinrIASolver, MMSEIASolver)
from pyphysim_tpu.simulations import (Result, SimulationResults,
                                      SimulationRunner)
from pyphysim_tpu.utils.conversion import dB2Linear

SOLVERS = {
    "closed_form": ClosedFormIASolver,
    "alt_min": AlternatingMinIASolver,
    "max_sinr": MaxSinrIASolver,
    "mmse": MMSEIASolver,
}


class IASimulationRunner(SimulationRunner):
    def __init__(self, solver_name: str = "max_sinr"):
        super().__init__()
        self.params.add("SNR", np.arange(0.0, 31.0, 5.0))
        self.params.set_unpack_parameter("SNR")
        self.rep_max = 20
        self.K, self.Nr, self.Nt, self.Ns = 3, 2, 2, 1
        self.solver_name = solver_name
        self.max_iterations = 60
        self.progressbar_message = f"IA {solver_name}"
        self._rep_seed = 0

    def _run_simulation(self, current_parameters):
        snr = dB2Linear(float(current_parameters["SNR"]))
        self._rep_seed += 1
        channel = MultiUserChannelMatrix()
        channel.set_channel_seed(self._rep_seed)
        channel.randomize(self.Nr, self.Nt, self.K)
        channel.noise_var = 1.0 / snr
        solver = SOLVERS[self.solver_name](channel)
        if hasattr(solver, "max_iterations"):
            solver.max_iterations = self.max_iterations
        solver.solve(Ns=self.Ns, P=1.0)
        results = SimulationResults()
        results.add_result(Result.create(
            "sum_capacity", Result.RATIOTYPE,
            solver.calc_sum_capacity(), 1))
        results.add_result(Result.create(
            "ia_iterations", Result.SUMTYPE,
            getattr(solver, "runned_iterations", 0)))
        return results


def main():
    for name in SOLVERS:
        runner = IASimulationRunner(name)
        runner.simulate()
        caps = np.array(
            runner.results.get_result_values_list("sum_capacity"))
        print(f"{name:12s} ({runner.elapsed_time}): "
              + " ".join(f"{c:6.2f}" for c in caps))


if __name__ == "__main__":
    main()
