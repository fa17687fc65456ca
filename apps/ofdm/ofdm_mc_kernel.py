#!/usr/bin/env python
"""OFDM-over-TDL BER sweep driven by the monolithic Pallas kernel.

Same simulation as ``apps/ofdm/ofdm_tdlchannel.py`` (the reference's
north-star chain, apps/ofdm/ofdm_tdlchannel.py:14-120), but the whole
Monte Carlo repetition runs inside ONE Pallas kernel
(``pyphysim_tpu/ops/mc_pallas.py``) plugged into ``SimulationRunner``
through the bulk-kernel extension point (``_gen_bulk_kernel``): the
kernel owns its repetition axis and generates data, fading rays and
noise from the TPU hardware PRNG, while the runner still provides the
parameter sweep, Result accumulation, checkpoint/resume and early stop.

On a TPU backend the in-kernel PRNG mode is used (~1.75e10 symbols/s on
one v5e chip); elsewhere the same kernel math runs under the Pallas
interpreter with host-supplied random bits, so the app works — slowly —
on CPU too. Both modes honor the runner's absolute-attempt-cursor
contract, so results are chunk-size invariant and resume is exact.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.channels import (COST259_TUx, JakesSampleGenerator,
                                   TdlChannel)
from pyphysim_tpu.modulators import OFDM
from pyphysim_tpu.ops.mc_pallas import MonteCarloOfdmTdl
from pyphysim_tpu.simulations import (Result, SimulationRunner,
                                      kernel_stream_seed)
from pyphysim_tpu.utils.conversion import dB2Linear


class OfdmMcKernelSimulationRunner(SimulationRunner):
    """16-QAM / OFDM(512, cp 52, 300 used) / COST259-TU with Jakes
    Doppler, one repetition = ``num_tiles * tile`` OFDM symbols."""

    def __init__(self):
        super().__init__()
        self.params.add("SNR", np.arange(0.0, 31.0, 5.0))
        self.params.set_unpack_parameter("SNR")
        self.rep_max = 16
        self.batch_size = 8
        self.update_progress_function_style = "text2"
        self.tile = 128              # OFDM symbols per kernel grid step
        self.num_tiles = 2           # grid steps (tiles) per repetition
        bandwidth = 20e6
        self.ofdm = OFDM(512, 52, 300)
        self.jakes = JakesSampleGenerator(Fd=30.0, Ts=1.0 / bandwidth,
                                          L=16)
        self.channel = TdlChannel(self.jakes, COST259_TUx)
        self.mc = MonteCarloOfdmTdl(self.ofdm, self.channel, M=16,
                                    tile=self.tile)
        self.batch_result_types = {
            "bit_errors": Result.SUMTYPE,
            "ber": Result.RATIOTYPE,
        }
        self._tpu = jax.default_backend() == "tpu"
        self._fns = {}

    # -- the bulk kernel ---------------------------------------------------

    def _bits_per_rep(self) -> int:
        return self.num_tiles * self.tile * self.mc._used * 4

    def _gen_bulk_kernel(self, current_parameters):
        mc, nt = self.mc, self.num_tiles
        snr = dB2Linear(float(current_parameters["SNR"]))
        bits_per_rep = self._bits_per_rep()
        unpack_idx = max(current_parameters.unpack_index, 0)
        # When the runner sweeps under simulate_in_parallel, the chunk's
        # rep axis is split across the mesh with per-device absolute
        # start offsets inside the kernel (mc_pallas build(mesh=...));
        # the stream contract keeps results bit-identical to unsharded.
        mesh = self.mesh

        if self._tpu:
            # in-kernel hardware PRNG; streams keyed by
            # (seed, unpack_index-folded) x absolute attempt index
            seed = kernel_stream_seed(self.base_seed, unpack_idx)

            def bulk(start, n):
                fkey = (n, mesh)
                if fkey not in self._fns:
                    self._fns[fkey] = self.mc.build(n, nt, mesh=mesh)
                # lazy device arrays: the runner fetches them AFTER
                # enqueueing the next chunk (double-buffered dispatch)
                counts = jnp.sum(
                    self._fns[fkey](jnp.int32(seed), jnp.float32(snr),
                                    jnp.int32(start)), axis=1)
                return {"bit_errors": counts,
                        "ber": (counts.astype(jnp.float32),
                                np.full(n, float(bits_per_rep)))}

            return bulk

        # CPU fallback: same kernel math under the Pallas interpreter,
        # uint32 bits drawn on the host per absolute attempt index
        amp = np.float32(np.sqrt(0.5 / snr) * mc.noise_gain)
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
            shape = (nt * mc._tile, mc._used_p)
            pb = jax.vmap(lambda k: draw(k, 0, (8, mc._TLp)))(keys)
            db = jax.vmap(lambda k: draw(k, 1, shape))(keys)
            n1 = jax.vmap(lambda k: draw(k, 2, shape))(keys)
            n2 = jax.vmap(lambda k: draw(k, 3, shape))(keys)
            counts = np.asarray(self._fns[fkey](pb, db, n1, n2, amp),
                                np.int64).sum(axis=1)
            return {"bit_errors": counts,
                    "ber": (counts.astype(float),
                            np.full(n, float(bits_per_rep)))}

        return bulk


def main():
    runner = OfdmMcKernelSimulationRunner()
    runner.simulate()
    print("\nElapsed time:", runner.elapsed_time)
    print("SNR:", runner.results.params["SNR"])
    print("BER:", np.array(runner.results.get_result_values_list("ber")))
    total = runner.rep_max * runner._bits_per_rep() // 4
    print(f"({len(runner.results.params['SNR'])} SNR points x "
          f"{total:,} symbols each)")


if __name__ == "__main__":
    main()
