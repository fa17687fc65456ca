#!/usr/bin/env python
"""Alamouti 2x1 QPSK BER sweep driven by the monolithic Pallas kernel.

Same simulation as the Alamouti branch of ``apps/mimo/simulate_mimo.py``
(the reference's apps/mimo/simulate_mimo.py:69-141 flat-Rayleigh chain),
but the whole Monte Carlo repetition runs inside ONE Pallas kernel
(``pyphysim_tpu/ops/alamouti_pallas.py``) plugged into
``SimulationRunner`` through the bulk-kernel extension point, exactly
like ``apps/ofdm/ofdm_mc_kernel.py``: the kernel owns its repetition
axis and draws data, channel and noise from the TPU hardware PRNG
(~2.3e10 symbols/s on one v5e chip), while the runner provides the SNR
sweep, Result accumulation, checkpoint/resume and early stop. On CPU
the identical kernel math runs under the Pallas interpreter with
host-supplied bits.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.ops.alamouti_pallas import MonteCarloAlamouti
from pyphysim_tpu.simulations import (Result, SimulationRunner,
                                      kernel_stream_seed)
from pyphysim_tpu.utils.conversion import dB2Linear


class AlamoutiMcKernelSimulationRunner(SimulationRunner):
    """QPSK / Alamouti 2x1 / iid flat Rayleigh; one repetition =
    ``num_tiles * tile * lane * 2`` symbols (lanes are independent
    virtual channel streams)."""

    def __init__(self, tile: int = 64, lane: int = 256,
                 num_tiles: int = 2):
        super().__init__()
        self.params.add("SNR", np.arange(0.0, 21.0, 5.0))
        self.params.set_unpack_parameter("SNR")
        self.rep_max = 16
        self.batch_size = 8
        self.update_progress_function_style = "text2"
        self.num_tiles = num_tiles
        self.mc = MonteCarloAlamouti(tile=tile, lane=lane)
        self.batch_result_types = {
            "bit_errors": Result.SUMTYPE,
            "ber": Result.RATIOTYPE,
        }
        self._tpu = jax.default_backend() == "tpu"
        self._fns = {}

    def _bits_per_rep(self) -> int:
        return self.num_tiles * self.mc.symbols_per_grid_step * 2

    def _gen_bulk_kernel(self, current_parameters):
        mc, nt = self.mc, self.num_tiles
        snr = dB2Linear(float(current_parameters["SNR"]))
        bits_per_rep = self._bits_per_rep()
        unpack_idx = max(current_parameters.unpack_index, 0)
        mesh = self.mesh

        if self._tpu:
            seed = kernel_stream_seed(self.base_seed, unpack_idx)

            def bulk(start, n):
                fkey = (n, mesh)
                if fkey not in self._fns:
                    self._fns[fkey] = mc.build(n, nt, mesh=mesh)
                counts = jnp.sum(
                    self._fns[fkey](jnp.int32(seed), jnp.float32(snr),
                                    jnp.int32(start)), axis=1)
                return {"bit_errors": counts,
                        "ber": (counts.astype(jnp.float32),
                                np.full(n, float(bits_per_rep)))}

            return bulk

        amp = np.float32(np.sqrt(0.5 / snr))
        base = jax.random.fold_in(jax.random.PRNGKey(self.base_seed),
                                  unpack_idx)

        def draw(key, salt, shape):
            return jax.random.bits(jax.random.fold_in(key, salt), shape,
                                   jnp.uint32)

        def bulk(start, n):
            fkey = (n, mesh)
            if fkey not in self._fns:
                self._fns[fkey] = mc.build_inject(n, nt, mesh=mesh)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(start, start + n))
            shape = (nt * mc._tile, mc._lane)
            ch = jax.vmap(lambda k: draw(k, 0, (8, mc._lane)))(keys)
            planes = [jax.vmap(lambda k, s=s: draw(k, s, shape))(keys)
                      for s in range(1, 6)]
            counts = np.asarray(self._fns[fkey](ch, *planes, amp),
                                np.int64).sum(axis=1)
            return {"bit_errors": counts,
                    "ber": (counts.astype(float),
                            np.full(n, float(bits_per_rep)))}

        return bulk


def main():
    runner = AlamoutiMcKernelSimulationRunner()
    runner.simulate()
    print("\nElapsed time:", runner.elapsed_time)
    print("SNR:", runner.results.params["SNR"])
    print("BER:", np.array(runner.results.get_result_values_list("ber")))


if __name__ == "__main__":
    main()
