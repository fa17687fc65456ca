#!/usr/bin/env python
"""CoMP (BD) transmission with external interference — one-shot script.

Counterpart of the reference's
``apps/comp_BD/simulate_comp_with_ext_int_simple.py``: a 3-cell cluster
with users at 70% of the cell border, 3GPP path loss, EnhancedBD joint
processing with the effective-throughput stream-sacrifice metric against a
rank-1 external interferer, and the full transmit chain (modulate ->
precode -> concatenated channel -> block-diagonal receive filter ->
demodulate -> SER/BER/spectral efficiency).

Run:  python apps/comp_BD/simulate_comp_with_ext_int_simple.py
         [--reps 100] [--pe-dbm 10]
"""

import argparse
import sys
from time import time

sys.path.insert(0, ".")

import jax

# host rep-loop with small per-rep matrices: the BD math is numpy and the
# few device ops are tiny, so keep them off the TPU tunnel
jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy import linalg as sp_linalg

from pyphysim_tpu.cell.cell import Grid
from pyphysim_tpu.channels.multiuser import MultiUserChannelMatrixExtInt
from pyphysim_tpu.channels.pathloss import PathLoss3GPP1
from pyphysim_tpu.comm.blockdiagonalization import EnhancedBD
from pyphysim_tpu.modulators import PSK
from pyphysim_tpu.progressbar import ProgressbarText
from pyphysim_tpu.utils.conversion import dB2Linear, dBm2Linear
from pyphysim_tpu.utils.misc import count_bit_errors, randn_c_RS


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reps", type=int, default=100)
    parser.add_argument("--pe-dbm", type=float, default=10.0)
    parser.add_argument("--snr", type=float, default=15.0)
    args = parser.parse_args()

    tic = time()
    cell_radius = 1.0  # km
    num_cells = 3
    num_clusters = 1
    Nr = np.ones(num_cells, dtype=int) * 2
    Nt = np.ones(num_cells, dtype=int) * 2
    M = 4
    modulator = PSK(M)
    packet_length = 60
    NSymbs = 500
    N0_dBm = -116.4
    ext_int_rank = 1

    path_loss_obj = PathLoss3GPP1()
    path_loss_border = float(path_loss_obj.calc_path_loss(cell_radius))
    noise_var = dBm2Linear(N0_dBm)
    snr = dB2Linear(args.snr)
    transmit_power = snr * noise_var / path_loss_border
    pe = dBm2Linear(args.pe_dbm)

    # 3-cell cluster with one user at 70% of each cell border
    grid = Grid()
    grid.create_clusters(num_clusters, num_cells, cell_radius)
    cluster0 = grid._clusters[0]
    cell_ids = np.arange(1, num_cells + 1)
    angles = np.array([210, -30, 90])
    cluster0.delete_all_users()
    cluster0.add_border_users(cell_ids, angles, 0.7)

    dists = cluster0.calc_dist_all_users_to_each_cell()
    pathloss = np.asarray(path_loss_obj.calc_path_loss(dists))
    dist_to_center = np.array(
        [cluster0.calc_dist(u) for u in cluster0.get_all_users()])
    pathloss_int = np.asarray(path_loss_obj.calc_path_loss(
        cluster0.external_radius - dist_to_center)).reshape(num_cells, 1)

    channel = MultiUserChannelMatrixExtInt()
    rng = np.random.RandomState(0)
    pbar = ProgressbarText(
        args.reps,
        message=f"Simulating for SNR: {args.snr}, Pe_dBm: {args.pe_dbm}")

    num_symbol_errors = num_symbols = num_bit_errors = num_bits = 0
    for rep in range(args.reps):
        channel.randomize(Nr, Nt, num_cells, ext_int_rank,
                          key=jax.random.PRNGKey(rep))
        channel.set_pathloss(pathloss, pathloss_int)
        channel.noise_var = noise_var

        comp_obj = EnhancedBD(num_cells, transmit_power, noise_var, pe)
        comp_obj.set_ext_int_handling_metric(
            "effective_throughput",
            {"modulator": modulator, "packet_length": packet_length})
        MsPk_all, Wk_all, Ns_all = \
            comp_obj.block_diagonalize_no_waterfilling(channel)

        input_data = rng.randint(0, M, [int(np.sum(Ns_all)), NSymbs])
        symbols = np.asarray(modulator.modulate(input_data))
        precoded = np.hstack(MsPk_all) @ symbols
        ext_data = np.sqrt(pe) * randn_c_RS(rng, ext_int_rank, NSymbs)
        all_data = np.vstack([precoded, ext_data])

        received = channel.corrupt_concatenated_data(all_data)
        received = received.to_numpy() if hasattr(received, "to_numpy") \
            else np.asarray(received)
        Wk = sp_linalg.block_diag(*Wk_all)
        decoded = np.asarray(modulator.demodulate(Wk @ received))

        num_symbol_errors += int(np.sum(decoded != input_data))
        num_symbols += input_data.size
        num_bit_errors += int(count_bit_errors(input_data, decoded))
        num_bits += input_data.size * modulator.K
        pbar.progress(rep + 1)

    print()
    ser = num_symbol_errors / num_symbols
    ber = num_bit_errors / num_bits
    per = 1 - (1 - ber) ** packet_length
    se = modulator.K * (1 - per)
    print(f"num_symbol_errors: {num_symbol_errors}")
    print(f"num_symbols: {num_symbols}")
    print(f"SER: {ser}")
    print(f"BER: {ber}")
    print(f"PER: {per}")
    print(f"Spectral Efficiency: {se} bits/symbol")
    print(f"Elapsed: {time() - tic:.1f} s")


if __name__ == "__main__":
    main()
