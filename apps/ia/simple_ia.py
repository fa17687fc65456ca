#!/usr/bin/env python
"""Compare MMSE and Max-SINR interference alignment on one channel.

Counterpart of the reference's ``apps/ia/simple_ia.py``: a K=3 user 4x4
interference channel with 2 streams/user at SNR 30 dB; the MMSE and
Max-SINR iterative solvers start from the SAME random precoders
(``initialize_with='fix'``) and their per-stream SINRs and sum capacities
are compared.

Run:  python apps/ia/simple_ia.py
"""

import sys

sys.path.insert(0, ".")

import jax

# The object solvers are host-side (numpy linalg, data-dependent
# convergence); run their few device ops on CPU. The batched on-device IA
# path is demonstrated in apps/ia/ia_SINRs_and_capacity.py.
jax.config.update("jax_platforms", "cpu")

import numpy as np

from pyphysim_tpu.channels.multiuser import MultiUserChannelMatrix
from pyphysim_tpu.ia.algorithms import MaxSinrIASolver, MMSEIASolver
from pyphysim_tpu.progressbar import ProgressbarText
from pyphysim_tpu.utils.conversion import dB2Linear, linear2dB


def calc_capacity(sinr):
    """Per-user capacity from per-user SINR arrays (linear scale)."""
    return np.array([np.sum(np.log2(1 + user_sinrs)) for user_sinrs in sinr])


def main():
    K, Nr, Nt, Ns = 3, 4, 4, 2
    SNR = 30.0
    P = 1.0
    noise_var = 1 / dB2Linear(SNR)

    rep_max = 1
    mmse_sinrs = np.empty([rep_max, K, Ns], dtype=float)
    max_sinr_sinrs = np.empty([rep_max, K, Ns], dtype=float)
    mmse_capacity = np.empty(rep_max, dtype=float)
    max_sinr_capacity = np.empty(rep_max, dtype=float)

    pbar = ProgressbarText(rep_max, message=f"Simulating for SNR: {SNR}")
    for rep in range(rep_max):
        channel = MultiUserChannelMatrix()
        channel.randomize(Nr, Nt, K, key=jax.random.PRNGKey(rep))
        channel.noise_var = noise_var

        mmse_solver = MMSEIASolver(channel)
        max_sinr_solver = MaxSinrIASolver(channel)

        # both solvers start from the SAME random precoders
        mmse_solver.randomizeF(Ns, P)
        mmse_solver.initialize_with = "fix"
        max_sinr_solver.initialize_with = "fix"
        max_sinr_solver._F = mmse_solver._F

        mmse_solver.max_iterations = 200
        mmse_solver.solve(Ns)
        max_sinr_solver.max_iterations = 200
        max_sinr_solver.solve(Ns)

        mmse_sinrs[rep] = [linear2dB(s) for s in mmse_solver.calc_SINR()]
        max_sinr_sinrs[rep] = [linear2dB(s)
                               for s in max_sinr_solver.calc_SINR()]
        mmse_capacity[rep] = np.sum(calc_capacity(mmse_solver.calc_SINR()))
        max_sinr_capacity[rep] = np.sum(
            calc_capacity(max_sinr_solver.calc_SINR()))
        pbar.progress(rep + 1)

    print()
    print(f"MMSE Average SINRs:\n{mmse_sinrs.mean(0)}")
    print(f"Max SINR Average SINRs:\n{max_sinr_sinrs.mean(0)}")
    print(f"MMSE Average Capacity: {mmse_capacity.mean()}")
    print(f"Max SINR Average Capacity: {max_sinr_capacity.mean()}")
    print("\nEnd!")


if __name__ == "__main__":
    main()
