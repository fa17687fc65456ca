#!/usr/bin/env python
"""IA with greedy / brute-force stream selection: BER + capacity sweep.

Counterpart of the reference's ``apps/ia/simulate_greedy_ia.py``: a
Max-SINR IA simulation where the number of streams per user is chosen by
the GreedStream meta-solver (drop the worst-SINR stream while sum capacity
improves) or the BruteForce meta-solver (try every stream-count
combination), compared against no selection. Tracks BER, sum capacity,
solver iterations and the chosen stream configuration as a CHOICETYPE
histogram, exactly the reference's result set.

The object meta-solvers are host-side and combinatorial (SURVEY §7 step 8
keeps them off the device hot path), so this app forces the CPU backend.

Run:  python apps/ia/simulate_greedy_ia.py [-i index]
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pyphysim_tpu.channels import MultiUserChannelMatrix
from pyphysim_tpu.ia import (BruteForceStreamIASolver, GreedStreamIASolver,
                             MaxSinrIASolver)
from pyphysim_tpu.modulators import PSK
from pyphysim_tpu.simulations import (Result, SimulationResults,
                                      SimulationRunner,
                                      simulate_do_what_i_mean)
from pyphysim_tpu.utils.conversion import dB2Linear
from pyphysim_tpu.utils.misc import count_bit_errors, randn_c_RS


class GreedyIASimulationRunner(SimulationRunner):
    """BER/sum-capacity of Max-SINR IA under three stream-selection
    policies (reference simulate_greedy_ia.py:25-530)."""

    def __init__(self):
        super().__init__()
        self.params.add("SNR", np.arange(0.0, 31.0, 10.0))
        self.params.add("stream_sel_method",
                        np.array(["none", "greedy", "brute"]))
        self.params.set_unpack_parameter("SNR")
        self.params.set_unpack_parameter("stream_sel_method")
        self.params.add("max_bit_errors", 2000)
        self.rep_max = 10
        self.K, self.Nr, self.Nt = 3, 4, 4
        self.max_Ns = 2  # maximum streams per user
        self.M = 4
        self.NSymbs = 100
        self.max_iterations = 60
        self.modulator = PSK(self.M)
        self.progressbar_message = \
            "Greedy IA {stream_sel_method} - SNR {SNR}"
        self._rep_seed = 0

    def _make_solver(self, method, channel):
        inner = MaxSinrIASolver(channel)
        inner.max_iterations = self.max_iterations
        if method == "greedy":
            return GreedStreamIASolver(inner)
        if method == "brute":
            return BruteForceStreamIASolver(inner)
        return inner

    def _run_simulation(self, current_parameters):
        snr = dB2Linear(float(current_parameters["SNR"]))
        method = str(current_parameters["stream_sel_method"])
        self._rep_seed += 1
        rs = np.random.RandomState(self._rep_seed)

        channel = MultiUserChannelMatrix()
        channel.set_channel_seed(self._rep_seed)
        channel.randomize(self.Nr, self.Nt, self.K)
        channel.noise_var = 1.0 / snr

        solver = self._make_solver(method, channel)
        solver.solve(np.full(self.K, self.max_Ns), P=1.0)
        ia = solver.iasolver if hasattr(solver, "iasolver") else solver
        Ns_chosen = np.array([f.shape[1] for f in ia.full_F])

        # transmit PSK data over the aligned network
        data = [rs.randint(0, self.M, (int(Ns_chosen[k]), self.NSymbs))
                for k in range(self.K)]
        tx = [np.asarray(self.modulator.modulate(d)) for d in data]
        precoded = [ia.full_F[k] @ tx[k] for k in range(self.K)]
        noise_amp = np.sqrt(1.0 / snr)
        decided = []
        for k in range(self.K):
            rx = noise_amp * randn_c_RS(rs, self.Nr, self.NSymbs)
            for l in range(self.K):
                rx = rx + channel.get_Hkl(k, l).to_numpy() @ precoded[l]
            # full_W_H makes the effective direct channel identity, so the
            # PSK decisions see unit-gain zero-phase streams
            y = ia.full_W_H[k] @ rx
            decided.append(np.asarray(self.modulator.demodulate(y)))

        bit_errors = int(sum(
            count_bit_errors(d, dec) for d, dec in zip(data, decided)))
        num_symbols = int(sum(d.size for d in data))
        num_bits = num_symbols * self.modulator.K
        symbol_errors = int(sum(
            np.sum(d != dec) for d, dec in zip(data, decided)))

        sinrs = ia.calc_SINR()
        sum_capacity = float(
            np.sum(np.log2(1.0 + np.hstack([np.asarray(s) for s in sinrs]))))

        # chosen stream configuration as a CHOICETYPE histogram index
        stream_index = int(np.ravel_multi_index(
            Ns_chosen - 1, np.full(self.K, self.max_Ns)))

        results = SimulationResults()
        results.add_result(Result.create("symbol_errors", Result.SUMTYPE,
                                         symbol_errors))
        results.add_result(Result.create("num_symbols", Result.SUMTYPE,
                                         num_symbols))
        results.add_result(Result.create("bit_errors", Result.SUMTYPE,
                                         bit_errors))
        results.add_result(Result.create("num_bits", Result.SUMTYPE,
                                         num_bits))
        results.add_result(Result.create("ber", Result.RATIOTYPE,
                                         bit_errors, num_bits))
        results.add_result(Result.create("ser", Result.RATIOTYPE,
                                         symbol_errors, num_symbols))
        results.add_result(Result.create("sum_capacity", Result.RATIOTYPE,
                                         sum_capacity, 1))
        results.add_result(Result.create(
            "ia_runned_iterations", Result.SUMTYPE,
            int(getattr(solver, "runned_iterations", 0) or 0)))
        results.add_result(Result.create(
            "stream_statistics", Result.CHOICETYPE, stream_index,
            self.max_Ns ** self.K))
        return results

    def _keep_going(self, current_params, current_sim_results, current_rep):
        if "bit_errors" in current_sim_results and \
                current_sim_results["bit_errors"]:
            cumulated = current_sim_results["bit_errors"][-1].get_result()
            return cumulated < self.params["max_bit_errors"]
        return True


def main():
    runner = GreedyIASimulationRunner()
    runner.set_results_filename("greedy_ia_results_{SNR}")
    simulate_do_what_i_mean(runner)

    params = runner.results.params
    methods = params["stream_sel_method"]
    snrs = params["SNR"]
    caps = np.array(runner.results.get_result_values_list("sum_capacity"))
    bers = np.array(runner.results.get_result_values_list("ber"))
    for method in methods:
        idx = params.get_pack_indexes({"stream_sel_method": method})
        print(f"\n{method}:")
        print("  SNR:          ", snrs)
        print("  sum capacity: ", caps[idx].round(2))
        print("  BER:          ", bers[idx])


if __name__ == "__main__":
    main()
