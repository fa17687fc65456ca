#!/usr/bin/env python
"""Block diagonalization with external interference — minimal example.

Counterpart of the reference's ``apps/simple_BD_with_whitening.py``: a
3-user 2x2 MIMO interference channel with one rank-1 external interference
source; plain BD, whitening BD and EnhancedBD precoders are computed and
the resulting effective channels checked to be block diagonal.

Run:  python apps/simple_BD_with_whitening.py
"""

import sys
from time import time

sys.path.insert(0, ".")

import jax
import numpy as np

from pyphysim_tpu.channels.multiuser import MultiUserChannelMatrixExtInt
from pyphysim_tpu.comm.blockdiagonalization import (BlockDiagonalizer,
                                                    EnhancedBD, WhiteningBD)
from pyphysim_tpu.modulators import PSK
from pyphysim_tpu.utils.conversion import dB2Linear, dBm2Linear


def main():
    tic = time()
    K = 3
    Nt = 2 * np.ones(K, dtype=int)
    Nr = 2 * np.ones(K, dtype=int)

    M = 4
    modulator = PSK(M)
    NSymbs = 500
    SNR_dB = 15.0
    N0_dBm = -116.4
    Pe_dBm = -100.0   # external interference transmit power
    ext_int_rank = 1

    noise_var = dBm2Linear(N0_dBm)
    snr = dB2Linear(SNR_dB)
    del snr  # transmit power fixed at 1.0 as in the reference
    transmit_power = 1.0
    pe = dBm2Linear(Pe_dBm)

    multiuser_channel = MultiUserChannelMatrixExtInt()
    multiuser_channel.randomize(Nr, Nt, K, ext_int_rank,
                                key=jax.random.PRNGKey(0))
    multiuser_channel.noise_var = noise_var

    rng = np.random.RandomState(0)
    input_data = rng.randint(0, M, [int(np.sum(Nt)), NSymbs])
    symbols = modulator.modulate(input_data)

    bd = BlockDiagonalizer(K, transmit_power, noise_var)
    whitening_bd = WhiteningBD(K, transmit_power, noise_var, pe)
    enhanced_bd = EnhancedBD(K, transmit_power, noise_var, pe)

    H_no_ext = np.asarray(multiuser_channel.big_H_no_ext_int.to_numpy())
    newH, Ms = bd.block_diagonalize_no_waterfilling(H_no_ext)
    # WhiteningBD returns (per-user precoders, per-user rx filters, Ns)
    Ms_w_all, Wk_w_all, Ns_w = whitening_bd.block_diagonalize_no_waterfilling(
        multiuser_channel)
    newH_e, Ms_e, Ns_all = enhanced_bd.block_diagonalize_no_waterfilling(
        multiuser_channel)

    # the equivalent channel must be block diagonal: zero off-block energy
    def offblock_energy(H):
        total = 0.0
        row = 0
        for k in range(K):
            col = 0
            for j in range(K):
                if j != k:
                    total += np.sum(
                        np.abs(H[row:row + Nr[k], col:col + Nt[j]]) ** 2)
                col += Nt[j]
            row += Nr[k]
        return total

    print("Tx symbols shape:", np.asarray(symbols).shape)
    print("BD off-block energy:        ", offblock_energy(newH))
    print("WhiteningBD streams per user:", Ns_w,
          "| precoder shapes:", [m.shape for m in Ms_w_all],
          "| rx filter shapes:", [w.shape for w in Wk_w_all])
    print("EnhancedBD streams per user: ", Ns_all)
    print("Precoder powers (BD):        ",
          [float(np.linalg.norm(Ms[:, k * 2:(k + 1) * 2]) ** 2)
           for k in range(K)])
    print("Elapsed:", time() - tic, "s")


if __name__ == "__main__":
    main()
