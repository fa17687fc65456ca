"""Monolithic Alamouti 2x1 Monte-Carlo Pallas kernel.

VMEM-resident counterpart of the unfused Alamouti chain (the reference's
``apps/mimo/simulate_mimo.py:69-141`` semantics: QPSK -> Alamouti 2x1
encode -> flat Rayleigh block fading -> AWGN -> matched combining ->
hard demod -> bit errors), built the same way as the flagship OFDM/TDL
kernel (:mod:`.mc_pallas`): data bits, channel and AWGN all come from
the in-kernel TPU hardware PRNG, every intermediate lives in VMEM, and
the only HBM traffic is one int32 error count per grid step.

The algebra collapses to pure sign arithmetic:

* QPSK (pi/4 offset, Gray): index bits ``(b1 b0)`` map to
  ``((1-2 b0) + j (1-2 b1)) / sqrt(2)`` and demodulation is two sign
  tests — no constellation gather, no argmin (matching
  ``modulators.PSK``'s table exactly: re < 0 <=> bit0, im < 0 <=> bit1).
* Each (row, lane) element of a grid block simulates one Alamouti
  CODEWORD (a symbol pair): the two receive samples, the matched
  combiner ``d1 = h1* r1 + h2 r2*``, ``d2 = h2* r1 - h1 r2*``
  (mimo.py:1073-1287; the combiner gain ``|h1|^2+|h2|^2`` is positive,
  so QPSK decisions need no division).
* The channel is constant over a (rep, lane) STREAM: lanes are
  independent virtual repetitions whose ``h`` is drawn once per rep from
  the per-rep ray stream (rows 0..3 of an (8, lane) draw) and re-derived
  identically by every tile of that rep — the same per-rep keying
  contract as :class:`.mc_pallas.MonteCarloOfdmTdl`, so the runner's
  absolute attempt cursor and the mesh sharding both apply unchanged.

Randomness is injectable (``build_inject``) for CPU-interpreter tests;
the TPU-PRNG mode runs the identical ``_simulate_block`` math.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc_pallas import _u11

__all__ = ["MonteCarloAlamouti"]


class MonteCarloAlamouti:
    """Builder for the single-kernel Alamouti 2x1 QPSK Monte Carlo rep.

    ``tile`` codeword rows x ``lane`` independent channel streams per
    grid step; a repetition is ``num_tiles`` consecutive tiles sharing
    one channel draw per lane. Symbols per call:
    ``reps * num_tiles * tile * lane * 2``.
    """

    def __init__(self, tile: int = 256, lane: int = 512) -> None:
        if tile < 8 or tile % 8:
            raise ValueError("tile must be a multiple of 8")
        if lane < 128 or lane % 128:
            raise ValueError("lane must be a multiple of 128")
        self._tile = int(tile)
        self._lane = int(lane)

    # ------------------------------------------------------------------

    def _simulate_block(self, ch_bits, d_bits, n1r_bits, n1i_bits,
                        n2r_bits, n2i_bits, amp):
        """One (tile, lane) block of Alamouti codewords -> error count.

        ch_bits: (8, lane) — rows 0..3 are (h1re, h1im, h2re, h2im)
        d_bits:  (tile, lane) — low 4 bits = the two QPSK indices
        n*_bits: (tile, lane) — AWGN uniforms (2 complex samples)
        amp: scalar f32 — per-component noise std ``sqrt(0.5/snr)``
        """
        f32 = jnp.float32
        clip = f32(0.99999994)  # two-sided tail clamp (mc_pallas:220-233)

        def gauss(bits):
            return jax.lax.erf_inv(jnp.clip(_u11(bits), -clip, clip))

        # h components ~ N(0, 1/2) per part: erf_inv(u)*sqrt(2) is
        # N(0,1), times sqrt(1/2) -> erf_inv(u) exactly
        h1r = gauss(ch_bits[0:1, :])
        h1i = gauss(ch_bits[1:2, :])
        h2r = gauss(ch_bits[2:3, :])
        h2i = gauss(ch_bits[3:4, :])

        idx = d_bits.astype(jnp.int32) & 15
        c = f32(1.0 / math.sqrt(2.0))
        s1r = (1 - 2 * (idx & 1)).astype(f32) * c
        s1i = (1 - 2 * ((idx >> 1) & 1)).astype(f32) * c
        s2r = (1 - 2 * ((idx >> 2) & 1)).astype(f32) * c
        s2i = (1 - 2 * ((idx >> 3) & 1)).astype(f32) * c

        sqrt2 = f32(math.sqrt(2.0))
        n1r = jax.lax.erf_inv(jnp.clip(_u11(n1r_bits), -clip, clip)) * sqrt2
        n1i = jax.lax.erf_inv(jnp.clip(_u11(n1i_bits), -clip, clip)) * sqrt2
        n2r = jax.lax.erf_inv(jnp.clip(_u11(n2r_bits), -clip, clip)) * sqrt2
        n2i = jax.lax.erf_inv(jnp.clip(_u11(n2i_bits), -clip, clip)) * sqrt2

        # received samples, power-split encode (mimo.py _encode / sqrt 2):
        # r1 = (h1 s1 + h2 s2)/sqrt2 + n,  r2 = (-h1 s2* + h2 s1*)/sqrt2
        r1r = (h1r * s1r - h1i * s1i + h2r * s2r - h2i * s2i) * c + \
            amp * n1r
        r1i = (h1r * s1i + h1i * s1r + h2r * s2i + h2i * s2r) * c + \
            amp * n1i
        r2r = (-(h1r * s2r + h1i * s2i) + h2r * s1r + h2i * s1i) * c + \
            amp * n2r
        r2i = (-(h1i * s2r - h1r * s2i) + (h2i * s1r - h2r * s1i)) * c + \
            amp * n2i

        # matched combining: d1 = h1* r1 + h2 r2*, d2 = h2* r1 - h1 r2*
        d1r = h1r * r1r + h1i * r1i + h2r * r2r + h2i * r2i
        d1i = h1r * r1i - h1i * r1r - (h2r * r2i - h2i * r2r)
        d2r = h2r * r1r + h2i * r1i - (h1r * r2r + h1i * r2i)
        d2i = h2r * r1i - h2i * r1r + (h1r * r2i - h1i * r2r)

        decided = ((d1r < 0).astype(jnp.int32) |
                   ((d1i < 0).astype(jnp.int32) << 1) |
                   ((d2r < 0).astype(jnp.int32) << 2) |
                   ((d2i < 0).astype(jnp.int32) << 3))
        diff = idx ^ decided
        errs = ((diff & 1) + ((diff >> 1) & 1) + ((diff >> 2) & 1) +
                ((diff >> 3) & 1))
        return jnp.sum(errs)

    # ------------------------------------------------------------------
    # TPU mode: in-kernel PRNG
    # ------------------------------------------------------------------

    def build(self, reps: int, num_tiles: int, mesh=None,
              axis: str = "mc"):
        """Jitted ``(seed:int32, snr_linear[, start]) ->
        (reps, num_tiles) int32`` bit-error counts. ``start`` offsets the
        per-repetition stream index (the runner bulk-path contract);
        ``mesh`` shards the rep axis bit-identically (same scheme as
        :meth:`.mc_pallas.MonteCarloOfdmTdl.build`)."""
        if mesh is None:
            call = self._make_prng_call(reps, num_tiles)

            @jax.jit
            def run(seed, snr_linear, start=0):
                amp = jnp.sqrt(0.5 / snr_linear).astype(jnp.float32)
                seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                                   jnp.asarray(start, jnp.int32)])
                return call(seeds, jnp.reshape(amp, (1,)))

            return run

        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.shape[axis])
        if reps % n_dev:
            raise ValueError(f"reps {reps} not divisible by mesh axis "
                             f"{axis!r} size {n_dev}")
        reps_local = reps // n_dev
        call = self._make_prng_call(reps_local, num_tiles)

        def local(seeds, amp):
            i = jax.lax.axis_index(axis)
            seeds = seeds.at[1].add(i * reps_local)
            return call(seeds, amp)

        sharded = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                            out_specs=P(axis), check_vma=False)
        replicated = NamedSharding(mesh, P())

        @jax.jit
        def run(seed, snr_linear, start=0):
            amp = jnp.sqrt(0.5 / snr_linear).astype(jnp.float32)
            seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                               jnp.asarray(start, jnp.int32)])
            out = sharded(seeds, jnp.reshape(amp, (1,)))
            return jax.lax.with_sharding_constraint(out, replicated)

        return run

    def _make_prng_call(self, reps: int, num_tiles: int):
        tile, lane = self._tile, self._lane

        def kernel(seed_ref, amp_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            r_abs = seed_ref[1] + r
            # even stream: per-rep channel (identical for every tile of
            # rep r); odd stream: per-tile data + noise (mc_pallas
            # keying, :342-358)
            pltpu.prng_seed(seed_ref[0], r_abs << 1)
            ch_bits = pltpu.prng_random_bits((8, lane))
            pltpu.prng_seed(seed_ref[0],
                            ((r_abs * num_tiles + s) << 1) | 1)
            d_bits = pltpu.prng_random_bits((tile, lane))
            n1r = pltpu.prng_random_bits((tile, lane))
            n1i = pltpu.prng_random_bits((tile, lane))
            n2r = pltpu.prng_random_bits((tile, lane))
            n2i = pltpu.prng_random_bits((tile, lane))
            out_ref[r, s] = self._simulate_block(
                ch_bits, d_bits, n1r, n1i, n2r, n2i, amp_ref[0])

        return pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )

    # ------------------------------------------------------------------
    # inject mode: bits are inputs — runs under the interpreter on CPU
    # ------------------------------------------------------------------

    def build_inject(self, reps: int, num_tiles: int,
                     interpret: bool = True, mesh=None,
                     axis: str = "mc"):
        """Same math with the randomness supplied as uint32 tensors:
        ``fn(ch_bits (reps, 8, lane), d/n1r/n1i/n2r/n2i
        (reps, num_tiles * tile, lane), amp) -> (reps, num_tiles)``.
        ``mesh`` shards the rep axis with :func:`shard_map` — the
        CPU-testable twin of the sharded TPU-PRNG mode (the bits carry
        the absolute attempt index, so results are bit-identical to
        unsharded; same contract as mc_pallas ``build_inject``)."""
        tile, lane = self._tile, self._lane
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(mesh.shape[axis])
            if reps % n_dev:
                raise ValueError(f"reps {reps} not divisible by mesh "
                                 f"axis {axis!r} size {n_dev}")
            local = self.build_inject(reps // n_dev, num_tiles,
                                      interpret)
            sharded = shard_map(
                local, mesh=mesh,
                in_specs=(P(axis),) * 6 + (P(),),
                out_specs=P(axis), check_vma=False)
            replicated = NamedSharding(mesh, P())

            @jax.jit
            def run(ch_bits, d_bits, n1r, n1i, n2r, n2i, amp):
                out = sharded(ch_bits, d_bits, n1r, n1i, n2r, n2i, amp)
                return jax.lax.with_sharding_constraint(out, replicated)

            return run

        def kernel(amp_ref, ch_ref, d_ref, n1r_ref, n1i_ref, n2r_ref,
                   n2i_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            out_ref[r, s] = self._simulate_block(
                ch_ref[0], d_ref[0], n1r_ref[0], n1i_ref[0], n2r_ref[0],
                n2i_ref[0], amp_ref[0])

        tiled = pl.BlockSpec((1, tile, lane), lambda r, s: (r, s, 0),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, lane), lambda r, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                tiled, tiled, tiled, tiled, tiled,
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )

        def run(ch_bits, d_bits, n1r, n1i, n2r, n2i, amp):
            return call(jnp.reshape(amp, (1,)).astype(jnp.float32),
                        ch_bits.astype(jnp.int32),
                        d_bits.astype(jnp.int32), n1r.astype(jnp.int32),
                        n1i.astype(jnp.int32), n2r.astype(jnp.int32),
                        n2i.astype(jnp.int32))

        return run

    # ------------------------------------------------------------------

    @property
    def symbols_per_grid_step(self) -> int:
        return self._tile * self._lane * 2
