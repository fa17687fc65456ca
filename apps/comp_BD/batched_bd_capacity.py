#!/usr/bin/env python
"""CoMP Block Diagonalization sum-capacity sweep — fully on device.

TPU-native extension of the reference's ``apps/comp_BD`` family: where
the reference (and the host ``EnhancedBD`` app here) computes one numpy
SVD chain per Monte Carlo repetition, this app runs the whole BD solve —
null-space SVDs, stream alignment, water-filling power loading and the
capacity reduction — as a vmapped jitted kernel through the runner's
batch path, using :func:`pyphysim_tpu.comm.bd_precoders_batched`.

It sweeps the per-BS power (in dB) and reports the BD sum capacity with
global water-filling vs equal power, per variation.

Run:  python apps/comp_BD/batched_bd_capacity.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.comm import bd_precoders_batched
from pyphysim_tpu.simulations import Result, SimulationRunner
from pyphysim_tpu.utils.conversion import dB2Linear
from pyphysim_tpu.utils.misc import randn_c


class BatchedBDCapacityRunner(SimulationRunner):
    """Sum capacity of [Spencer2004] BD over iid Rayleigh joint channels
    (reference blockdiagonalization.py:181-663 semantics, device batch
    execution)."""

    def __init__(self, mode: str = "global"):
        super().__init__()
        self.params.add("Pu_dB", np.arange(-5.0, 21.0, 5.0))
        self.params.set_unpack_parameter("Pu_dB")
        self.rep_max = 512
        self.K, self.nr_u, self.nt_tot = 3, 2, 6
        self.noise_var = 1.0
        self.mode = mode
        self.progressbar_message = f"BD capacity ({mode}) - Pu {{Pu_dB}}"
        self.batch_result_types = {"sum_capacity": Result.RATIOTYPE}

    def _gen_simulation_kernel(self, current_parameters):
        iPu = float(dB2Linear(float(current_parameters["Pu_dB"])))
        K, nr_u, nt_tot = self.K, self.nr_u, self.nt_tot
        nv, mode = self.noise_var, self.mode

        def kernel(key):
            H = randn_c(key, K * nr_u, nt_tot)
            _, Ms, Sigma = bd_precoders_batched(H, K, iPu, nv, mode)
            # per-stream transmit power = column power of the precoder
            p = jnp.sum(Ms.re ** 2 + Ms.im ** 2, axis=-2)
            cap = jnp.sum(jnp.log2(1.0 + p * Sigma ** 2 / nv))
            # degenerate draw (numerically singular null-space chain):
            # mark the repetition invalid — the runner excludes it and
            # retries with a fresh fold_in index, the batch-path form of
            # the reference's SkipThisOne (runner.py:151-185)
            valid = jnp.isfinite(cap) & (jnp.min(Sigma) > 1e-6)
            return {"sum_capacity": (cap, jnp.asarray(1.0)),
                    "__valid__": valid}

        return kernel


def main():
    for mode in ("global", "none"):
        runner = BatchedBDCapacityRunner(mode)
        runner.simulate()
        caps = np.array(
            runner.results.get_result_values_list("sum_capacity"))
        label = {"global": "waterfilling", "none": "equal power"}[mode]
        print(f"{label:13s} ({runner.elapsed_time}): "
              + " ".join(f"{c:6.2f}" for c in caps))


if __name__ == "__main__":
    main()
