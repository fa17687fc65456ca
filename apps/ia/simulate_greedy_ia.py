#!/usr/bin/env python
"""IA with greedy / brute-force stream selection: BER + capacity sweep.

Counterpart of the reference's ``apps/ia/simulate_greedy_ia.py:25-530``: an
MMSE-IA simulation where the number of streams per user is chosen by the
GreedStream meta-solver (drop the worst-SINR stream while sum capacity
improves), the BruteForce meta-solver (try every stream-count combination),
or not at all ('none'). Driven by ``greedy_config_file.txt``: the sweep
unpacks SNR x stream_sel_method x scenario x initialize_with, where
scenario is 'NoPathLoss' (unit-gain channels) or 'Random' (users dropped
uniformly in a hexagonal cell grid with 3GPP path loss, transmit power set
to hit the target SNR at the cell border). Tracks BER, sum capacity,
solver iterations and the chosen stream configuration as a CHOICETYPE
histogram — exactly the reference's result set
(simulate_greedy_ia.py:380-444).

The object meta-solvers are host-side and combinatorial (SURVEY §7 step 8
keeps them off the device hot path), so this app forces the CPU backend.

Run:  python apps/ia/simulate_greedy_ia.py [-c config] [-i index]
"""

import os
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pyphysim_tpu.cell import cell
from pyphysim_tpu.channels import multiuser, pathloss
from pyphysim_tpu.ia import algorithms
from pyphysim_tpu.modulators import fundamental
from pyphysim_tpu.simulations import (Result, SimulationResults,
                                      SimulationRunner, SkipThisOne,
                                      simulate_do_what_i_mean)
from pyphysim_tpu.utils import misc
from pyphysim_tpu.utils.conversion import dB2Linear, dBm2Linear
from pyphysim_tpu.utils.misc import count_bit_errors, level2bits

# Reference spec: simulate_greedy_ia.py:44-68.
SPEC = """[Grid]
cell_radius=float(min=0.01, default=1.0)
num_cells=integer(min=3, default=3)
num_clusters=integer(min=1, default=1)
[Scenario]
NSymbs=integer(min=10, max=1000000, default=200)
SNR=real_numpy_array(min=-50, max=100, default=0:5:31)
M=integer(min=4, max=512, default=4)
modulator=option('QPSK', 'PSK', 'QAM', 'BPSK', default="PSK")
Nr=integer_scalar_or_integer_numpy_array_check(min=2, default=3)
Nt=integer_scalar_or_integer_numpy_array_check(min=2, default=3)
Ns=integer_scalar_or_integer_numpy_array_check(min=1, default=3)
N0=float(default=-116.4)
scenario=string_list(default=list('Random', 'NoPathLoss'))
[IA Algorithm]
max_iterations=integer(min=1, default=120)
initialize_with=string_list(default=list('random'))
stream_sel_method=string_list(default=list('greedy', 'brute'))
[General]
rep_max=integer(min=1, default=2000)
max_bit_errors=integer(min=1, default=3000)
unpacked_parameters=string_list(default=list('SNR', 'stream_sel_method', 'scenario', 'initialize_with'))
""".split("\n")


class IAStreamSelSimulationRunner(SimulationRunner):
    """BER/sum-capacity of MMSE IA under stream-selection policies
    (reference simulate_greedy_ia.py:25-530)."""

    def __init__(self, default_config_file: str = "greedy_config_file.txt",
                 read_command_line_args: bool = True):
        super().__init__(default_config_file, SPEC, read_command_line_args)
        self.rep_max = int(self.params["rep_max"])

        self.multiUserChannel = multiuser.MultiUserChannelMatrix()
        self.path_loss_obj = pathloss.PathLoss3GPP1()

        # seeds kept explicit for debugging replays
        # (simulate_greedy_ia.py:92-102)
        self.channel_seed = None
        self.noise_seed = None
        self.data_gen_seed = int(np.random.randint(10000))
        self.multiUserChannel.set_channel_seed(self.channel_seed)
        self.multiUserChannel.set_noise_seed(self.noise_seed)
        self.data_RS = np.random.RandomState(self.data_gen_seed)

        M = int(self.params["M"])
        modulator_options = {"PSK": fundamental.PSK,
                             "QPSK": fundamental.QPSK,
                             "QAM": fundamental.QAM,
                             "BPSK": fundamental.BPSK}
        name = str(self.params["modulator"])
        self.modulator = (modulator_options[name]() if name in
                          ("QPSK", "BPSK") else modulator_options[name](M))

        self.progressbar_message = "SNR: {SNR}"

        # hexagonal cell grid for the 'Random' scenario
        # (simulate_greedy_ia.py:128-147)
        self.cell_grid = cell.Grid()
        self.cell_grid.create_clusters(int(self.params["num_clusters"]),
                                       int(self.params["num_cells"]),
                                       float(self.params["cell_radius"]))
        self.noise_var = None
        self._path_loss_border = self.path_loss_obj.calc_path_loss(
            float(self.params["cell_radius"]))

        self.ia_solver = algorithms.MMSEIASolver(self.multiUserChannel)
        self.ia_top_object = None

    # -- scenario construction (simulate_greedy_ia.py:191-256) -------------

    @staticmethod
    def _calc_transmit_power(SNR_dB, noise_var, path_loss=1.0):
        """Transmit power achieving the desired mean SNR at the cell
        border (simulate_greedy_ia.py:162-189)."""
        return dB2Linear(SNR_dB) * noise_var / path_loss

    def _create_random_users_scenario(self, current_params):
        cluster0 = self.cell_grid.get_cluster_from_index(0)
        cell_ids = np.arange(1, int(current_params["num_cells"]) + 1)
        cluster0.delete_all_users()
        cluster0.add_random_users(cell_ids)

    def _create_users_channels_according_to_scenario(self, current_params):
        self.multiUserChannel.randomize(current_params["Nr"],
                                        current_params["Nt"],
                                        int(current_params["num_cells"]))
        scenario = str(current_params["scenario"])
        if scenario == "NoPathLoss":
            self.cell_grid.get_cluster_from_index(0).delete_all_users()
        elif scenario == "Random":
            self._create_random_users_scenario(current_params)
            cluster0 = self.cell_grid.get_cluster_from_index(0)
            dists = cluster0.calc_dist_all_users_to_each_cell()
            pl = self.path_loss_obj.calc_path_loss(dists)
            self.multiUserChannel.set_pathloss(pl)
        else:
            raise RuntimeError(f"Invalid scenario: {scenario}")

    # -- one repetition (simulate_greedy_ia.py:257-444) --------------------

    def _run_simulation(self, current_parameters):
        self._create_users_channels_according_to_scenario(current_parameters)

        M = self.modulator.M
        NSymbs = int(current_parameters["NSymbs"])
        K = int(current_parameters["num_cells"])
        Ns = current_parameters["Ns"]
        SNR = float(current_parameters["SNR"])

        if str(current_parameters["scenario"]) == "NoPathLoss":
            pt = self._calc_transmit_power(SNR, self.noise_var)
        else:
            pt = self._calc_transmit_power(SNR, self.noise_var,
                                           self._path_loss_border)

        orig_Ns = (np.ones(K, dtype=int) * int(Ns)
                   if np.ndim(Ns) == 0 else np.asarray(Ns).copy())

        self.ia_solver.clear()
        self.ia_solver.initialize_with = str(
            current_parameters["initialize_with"])
        try:
            self.ia_top_object.solve(Ns=Ns, P=pt)
        except (RuntimeError, np.linalg.LinAlgError) as exc:
            raise SkipThisOne(
                "Could not find the IA solution. Skipping this repetition"
            ) from exc

        Ns_arr = self.ia_solver.Ns
        cumNs = np.cumsum(Ns_arr)

        inputData = self.data_RS.randint(0, M, (int(np.sum(Ns_arr)), NSymbs))
        modulatedData = np.asarray(self.modulator.modulate(inputData))

        transmit_signal = np.split(modulatedData, cumNs[:-1])
        precoded = [self.ia_solver.full_F[k] @ transmit_signal[k]
                    for k in range(K)]

        received = self.multiUserChannel.corrupt_data(precoded)
        received = [r.to_numpy() if hasattr(r, "to_numpy") else r
                    for r in received]
        no_interf = [self.ia_solver.full_W_H[k] @ received[k]
                     for k in range(K)]
        demodulated = np.asarray(
            self.modulator.demodulate(np.vstack(no_interf)))

        symbolErrors = int(np.sum(inputData != demodulated))
        bitErrors = int(count_bit_errors(inputData, demodulated))
        numSymbols = inputData.size
        numBits = inputData.size * level2bits(M)
        ia_cost = float(self.ia_solver.get_cost())

        sinr_all_k = self.ia_solver.calc_SINR()
        total_sum_capacity = float(sum(
            np.sum(np.log2(1.0 + np.asarray(s))) for s in sinr_all_k))
        ia_runned_iterations = int(
            getattr(self.ia_solver, "runned_iterations", 0) or 0)

        # chosen stream configuration as a CHOICETYPE histogram index
        # (simulate_greedy_ia.py:417-427)
        stream_index = int(np.ravel_multi_index(Ns_arr - 1, orig_Ns))
        num_choices = int(np.prod(orig_Ns))

        simResults = SimulationResults()
        simResults.add_result(
            Result.create("symbol_errors", Result.SUMTYPE, symbolErrors))
        simResults.add_result(
            Result.create("num_symbols", Result.SUMTYPE, numSymbols))
        simResults.add_result(
            Result.create("bit_errors", Result.SUMTYPE, bitErrors))
        simResults.add_result(
            Result.create("num_bits", Result.SUMTYPE, numBits))
        simResults.add_result(Result.create(
            "ber", Result.RATIOTYPE, bitErrors, numBits))
        simResults.add_result(Result.create(
            "ser", Result.RATIOTYPE, symbolErrors, numSymbols))
        simResults.add_result(Result.create(
            "ia_cost", Result.RATIOTYPE, ia_cost, 1))
        simResults.add_result(Result.create(
            "sum_capacity", Result.RATIOTYPE, total_sum_capacity, 1))
        simResults.add_result(Result.create(
            "ia_runned_iterations", Result.RATIOTYPE,
            ia_runned_iterations, 1))
        simResults.add_result(Result.create(
            "stream_statistics", Result.CHOICETYPE, stream_index,
            num_choices))
        return simResults

    def _keep_going(self, current_params, current_sim_results, current_rep):
        # Every 300 reps: stop once the 95% CI is narrower than a tenth of
        # the BER and at least 5000 reps ran (simulate_greedy_ia.py:445-496)
        if current_rep % 300 == 0 and current_rep > 0:
            ber_result = current_sim_results["ber"][-1]
            ber_value = ber_result.get_result()
            if ber_value == 0.0:
                return True
            lo, hi = ber_result.get_confidence_interval(P=95)
            if abs(hi - lo) < ber_value / 10.0 and current_rep > 5000:
                return False
        return True

    def _on_simulate_current_params_start(self, current_params):
        # fresh streams per variation so parallel workers differ
        # (simulate_greedy_ia.py:497-530)
        self.multiUserChannel.re_seed()

        if str(current_params["scenario"]) == "NoPathLoss":
            self.noise_var = 1.0
        else:
            self.noise_var = dBm2Linear(float(self.params["N0"]))
        self.multiUserChannel.noise_var = self.noise_var

        self.ia_solver.max_iterations = int(current_params["max_iterations"])

        alg = str(current_params["stream_sel_method"])
        if alg == "greedy":
            self.ia_top_object = algorithms.GreedStreamIASolver(
                self.ia_solver)
        elif alg == "brute":
            self.ia_top_object = algorithms.BruteForceStreamIASolver(
                self.ia_solver)
        elif alg == "none":
            self.ia_top_object = self.ia_solver
        else:
            raise ValueError(f"Invalid stream selection method: '{alg}'")


def main():
    config = "greedy_config_file.txt"
    if not os.path.exists(config):
        here = os.path.dirname(os.path.abspath(__file__))
        candidate = os.path.join(here, "greedy_config_file.txt")
        config = candidate if os.path.exists(candidate) else None

    runner = IAStreamSelSimulationRunner(config)
    # reference base name: greedy_statistics.py:52-54
    runner.set_results_filename(
        "greedy_IA_stream_sel_results_{SNR}_{M}-{modulator}_{Nr}x{Nt}"
        "_({Ns})_MaxIter_{max_iterations}_({initialize_with})")
    simulate_do_what_i_mean(runner)

    params = runner.results.params
    methods = params["stream_sel_method"]
    caps = np.array(runner.results.get_result_values_list("sum_capacity"))
    bers = np.array(runner.results.get_result_values_list("ber"))
    for method in methods:
        idx = params.get_pack_indexes({"stream_sel_method": method})
        print(f"\n{method}:")
        print("  sum capacity: ", np.round(caps[idx], 2))
        print("  BER:          ", bers[idx])
    print("Elapsed:", runner.elapsed_time)


if __name__ == "__main__":
    main()
