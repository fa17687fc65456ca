"""Monolithic Monte-Carlo Pallas kernel: the whole OFDM-over-TDL
repetition in one VMEM-resident program.

The XLA fused path (ops/fused_ofdm_tdl.py) already collapses the
per-symbol algebra to "one tap-spectrum matmul + an elementwise
multiply", but every stage still round-trips HBM: QAM map write, channel
multiply, noise add, equalize, slice, popcount each read and write the
(batch, n_sym * used) signal. The roofline audit (docs/tpu_performance.md)
puts that path at ~50% of HBM speed-of-light with the remaining gap being
exactly those elementwise passes. This kernel removes the traffic
entirely: data bits, Jakes ray phases and AWGN are all generated
*inside* the kernel from the TPU hardware PRNG, every intermediate lives
in VMEM, and the only HBM I/O is a tiny constant matrix in and one int32
error count out per grid step.

Two algebraic collapses stack on top of the diag-collapse:

* ray-sum + tap spectrum -> ONE matmul. The per-bin channel is
  ``H[s, u] = sum_i sqrt(p_i) (1/sqrt(L)) sum_l e^{j(w_{il} t_s + psi_{il})}
  e^{-2 pi j d_i u / fft}``; flattening (tap i, ray l) into one axis makes
  this ``E @ G`` with ``E[s, il] = e^{j phase}`` (pure VPU trig) and a
  constant ``G[il, u] = sqrt(p_i / L) e^{-2 pi j d_i bin_u / fft}``
  (host-precomputed) — the MXU does the ray reduction and the sparse DFT
  in the same pass.
* time-domain AWGN -> post-demodulation AWGN with std scaled by
  ``noise_gain`` (exact: receiver transform rows are orthogonal with
  equal norm — see ops/fused_ofdm_tdl.py noise_gain).

Randomness
----------
``mode="tpu"`` draws everything from ``pltpu.prng_random_bits``; streams
are keyed as (seed, rep) for the per-rep channel phases — every symbol
tile of a rep re-derives the SAME rays, keeping the channel continuous
across tiles — and (seed, rep, tile, salt) for data+noise. ``mode="inject"``
takes the exact same uint32 bit tensors as kernel *inputs* instead, so
the full math pipeline runs bit-for-bit reproducibly under the Pallas
interpreter on CPU, where tests pin it against an independent jnp model
and against the (already test-pinned) XLA fused chain.

Parity: this implements the same simulation semantics as the reference
chain ``apps/ofdm/ofdm_tdlchannel.py`` (QAM -> OFDM -> TDL w/ Jakes ->
one-tap equalizer -> hard demod -> bit errors; fading.py:1126-1287
block-static evolution), with identical receiver statistics to this
repo's time-domain chain (tests/test_mc_pallas.py, tests/test_fused_ofdm_tdl.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["MonteCarloOfdmTdl"]

_TWO_PI = 6.283185307179586


def _u01(bits) -> jnp.ndarray:
    """uint32 bits -> float32 uniform in [0, 1): signed-int32 view scaled
    and shifted (one multiply-add, no 64-bit math)."""
    i32 = bits.astype(jnp.int32) if bits.dtype != jnp.int32 else bits
    return i32.astype(jnp.float32) * jnp.float32(2.0 ** -32) + \
        jnp.float32(0.5)


def _u11(bits) -> jnp.ndarray:
    """uint32 bits -> float32 uniform in [-1, 1): single multiply on the
    signed-int32 view (= 2 * _u01(bits) - 1 with one rounding step)."""
    i32 = bits.astype(jnp.int32) if bits.dtype != jnp.int32 else bits
    return i32.astype(jnp.float32) * jnp.float32(2.0 ** -31)


def _inv_gray(p):
    """Arithmetic inverse Gray code (xor-prefix), exact for < 8 bits."""
    out = p
    sh = 1
    while sh < 8:
        out = out ^ (out >> sh)
        sh *= 2
    return out


class MonteCarloOfdmTdl:
    """Builder for the single-kernel Monte Carlo rep.

    Parameters mirror the flagship chain: a square-``M`` QAM
    constellation, an OFDM geometry and a Jakes/TDL channel whose CP
    covers the channel span (the fused-path validity condition,
    ops/fused_ofdm_tdl.py:84-90).

    ``tile`` OFDM symbols are simulated per grid step; a repetition is
    ``num_tiles`` consecutive tiles sharing one set of Jakes rays.
    """

    def __init__(self, ofdm, channel, M: int = 16, tile: int = 256,
                 matmul_dtype=jnp.float32) -> None:
        from ..utils.misc import level2bits

        profile = channel.channel_profile
        gen = channel._fading_generator
        if not hasattr(gen, "Fd"):
            raise ValueError("MonteCarloOfdmTdl requires a Jakes generator")
        span = int(profile.tap_delays.astype(int)[-1]) + 1
        if ofdm.cp_size < span - 1:
            raise ValueError(
                f"cp_size {ofdm.cp_size} < channel span - 1 ({span - 1})")
        Lq = int(round(math.sqrt(M)))
        if Lq * Lq != M or M & (M - 1):
            raise ValueError("M must be a square power of 2")
        if tile < 8 or tile & (tile - 1):
            raise ValueError("tile must be a power of two >= 8 "
                             "(the E matrix is built by row doubling)")

        self._ofdm = ofdm
        self._M = M
        self._bits_per_symbol = level2bits(M)
        self._half_bits = self._bits_per_symbol // 2
        self._Lq = Lq
        self._qam_scale = math.sqrt((M - 1) * 2.0 / 3.0)
        self._tile = int(tile)
        self._matmul_dtype = jnp.dtype(matmul_dtype)

        used = ofdm.num_used_subcarriers
        self._used = used
        self._used_p = ((used + 127) // 128) * 128

        # --- constant G matrix: (tap, ray) -> used bin -------------------
        delays = profile.tap_delays.astype(int)          # sample indices
        powers = profile.tap_powers_linear               # normalized to 1
        Lrays = gen.L
        TL = delays.size * Lrays
        self._TL = TL
        self._TLp = ((TL + 127) // 128) * 128
        bins = ofdm.get_used_subcarrier_indexes() % ofdm.fft_size
        phase = (-_TWO_PI / ofdm.fft_size) * np.outer(
            np.repeat(delays, Lrays), bins)              # (TL, used)
        w = np.repeat(np.sqrt(powers / Lrays), Lrays)[:, None]
        g_re = np.zeros((self._TLp, self._used_p), np.float64)
        g_im = np.zeros((self._TLp, self._used_p), np.float64)
        g_re[:TL, :used] = w * np.cos(phase)
        g_im[:TL, :used] = w * np.sin(phase)
        self._g_re = jnp.asarray(g_re, self._matmul_dtype)
        self._g_im = jnp.asarray(g_im, self._matmul_dtype)

        # per-OFDM-symbol phase advance coefficient: w_il = C cos(phi_il),
        # phase(s) = s * w_il + psi_il  (block-static per symbol)
        self._C = float(_TWO_PI * gen.Fd * gen.Ts * ofdm.samples_per_symbol)
        # post-demod equivalent AWGN std multiplier (exact)
        self._noise_gain = math.sqrt(
            ofdm.fft_size / ofdm._calculate_power_scale())

    # ------------------------------------------------------------------
    # shared math: one (tile x used) symbol block given raw uint32 bits
    # ------------------------------------------------------------------

    def _simulate_block(self, phase_bits, data_bits, n1_bits, n2_bits,
                        tile_idx, amp, g_re, g_im):
        """All the physics, from random bits to a bit-error count.

        phase_bits: (8, TLp) — rows 0/1 used for (phi, psi)
        data_bits:  (tile, used_p) — low bits_per_symbol bits = tx symbol
        n1/n2_bits: (tile, used_p) — Box-Muller uniforms
        tile_idx:   scalar int32 — which symbol tile of the rep
        amp:        scalar f32 — per-component noise std
        g_re/g_im:  (TLp, used_p) — the constant (tap, ray)->bin matrix
        """
        f32 = jnp.float32
        tile, used_p = self._tile, self._used_p
        Lq, half_bits = self._Lq, self._half_bits

        # --- Jakes rays -> per-bin channel (ONE complex matmul) --------
        phi = _u01(phase_bits[0:1, :]) * f32(_TWO_PI)     # (1, TLp)
        psi = _u01(phase_bits[1:2, :]) * f32(_TWO_PI)
        wl = f32(self._C) * jnp.cos(phi)                  # (1, TLp)
        # E[r, il] = e^{j((t0 + r) wl + psi)} built by log-depth doubling:
        # trig only for the first 8 rows and the 8-step rotator, then
        # each level appends rows [R..2R) = rows [0..R) * e^{j R wl}
        # (pure complex multiplies — drops the per-row transcendental
        # count ~tile/8-fold; f32 drift over log2(tile) squarings ~1e-6)
        t8 = (tile_idx * tile +
              jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)).astype(f32)
        ph8 = t8 * wl + psi                               # (8, TLp)
        e_re = jnp.cos(ph8)
        e_im = jnp.sin(ph8)
        d_re = jnp.cos(f32(8.0) * wl)                     # (1, TLp)
        d_im = jnp.sin(f32(8.0) * wl)
        rows = 8
        while rows < tile:
            n_re = e_re * d_re - e_im * d_im
            n_im = e_re * d_im + e_im * d_re
            e_re = jnp.concatenate([e_re, n_re], axis=0)
            e_im = jnp.concatenate([e_im, n_im], axis=0)
            s_re = d_re * d_re - d_im * d_im
            d_im = f32(2.0) * d_re * d_im
            d_re = s_re
            rows *= 2
        md = self._matmul_dtype
        e_re = e_re.astype(md)
        e_im = e_im.astype(md)
        h_re = (jnp.dot(e_re, g_re, preferred_element_type=f32) -
                jnp.dot(e_im, g_im, preferred_element_type=f32))
        h_im = (jnp.dot(e_re, g_im, preferred_element_type=f32) +
                jnp.dot(e_im, g_re, preferred_element_type=f32))

        # --- data symbols: arithmetic Gray QAM map ---------------------
        idx = data_bits.astype(jnp.int32) & (self._M - 1)
        col = idx & (Lq - 1)
        row = idx >> half_bits
        jj = col ^ (col >> 1)
        ii = row ^ (row >> 1)
        inv_scale = f32(1.0 / self._qam_scale)
        x_re = (2 * jj - (Lq - 1)).astype(f32) * inv_scale
        x_im = ((Lq - 1) - 2 * ii).astype(f32) * inv_scale

        # --- AWGN via inverse-CDF (post-demod equivalent variance) -----
        # erf_inv is a rational polynomial on TPU — ~5x cheaper than
        # Box-Muller's log+sqrt+sincos. Same construction (and the same
        # f32 ~3.9-sigma reach) as jax.random.normal. BOTH tails must be
        # clamped: the int32->f32 cast in _u11 rounds the 64 largest
        # int32 values to exactly 1.0 (p ~ 1.5e-8 per draw), and
        # erf_inv(1.0) = +inf would poison the symbol decision — at
        # ~1e10 sym/s that fires constantly and imposes a spurious
        # ~1e-8 BER floor exactly in the deep-BER regime.
        sqrt2 = f32(math.sqrt(2.0))
        z1 = jnp.clip(_u11(n1_bits), f32(-0.99999994), f32(0.99999994))
        z2 = jnp.clip(_u11(n2_bits), f32(-0.99999994), f32(0.99999994))
        n_re = jax.lax.erf_inv(z1) * sqrt2
        n_im = jax.lax.erf_inv(z2) * sqrt2

        y_re = x_re * h_re - x_im * h_im + amp * n_re
        y_im = x_re * h_im + x_im * h_re + amp * n_im

        # --- one-tap equalize + O(1) slicer ----------------------------
        den = h_re * h_re + h_im * h_im + f32(1e-30)
        eq_re = (y_re * h_re + y_im * h_im) / den
        eq_im = (y_im * h_re - y_re * h_im) / den
        scale = f32(self._qam_scale)
        # floor(x + 0.5) rather than round-half-even: ties have measure
        # zero and this keeps kernel and test model bit-identical
        col_pos = jnp.clip(jnp.floor(
            (eq_re * scale + (Lq - 1)) * f32(0.5) + f32(0.5)),
            0, Lq - 1).astype(jnp.int32)
        row_pos = jnp.clip(jnp.floor(
            ((Lq - 1) - eq_im * scale) * f32(0.5) + f32(0.5)),
            0, Lq - 1).astype(jnp.int32)
        decided = (_inv_gray(row_pos) << half_bits) | _inv_gray(col_pos)

        # --- bit errors over the real (non-padding) bins ---------------
        diff = idx ^ decided
        errs = jnp.zeros(diff.shape, jnp.int32)
        for k in range(self._bits_per_symbol):
            errs = errs + ((diff >> k) & 1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, used_p), 1)
        return jnp.sum(jnp.where(col_ids < self._used, errs, 0))

    # ------------------------------------------------------------------
    # TPU mode: in-kernel PRNG, grid (reps, num_tiles)
    # ------------------------------------------------------------------

    def build(self, reps: int, num_tiles: int, mesh=None,
              axis: str = "mc"):
        """Jitted ``(seed:int32, snr_linear[, start]) ->
        (reps, num_tiles) int32`` error counts; everything generated on
        device from the hardware PRNG. Symbols simulated per call:
        ``reps * num_tiles * tile * num_used``.

        ``start`` offsets the per-repetition stream index: repetition
        ``r`` draws from streams keyed by ``(seed, start + r)``, so a
        caller batching attempts in chunks (the runner's bulk-kernel
        path) gets chunk-size-invariant, resumable randomness.

        ``mesh``: a :class:`jax.sharding.Mesh` to split the rep axis
        over (``reps`` must divide evenly by ``mesh.shape[axis]``). Each
        device runs the SAME kernel over its contiguous rep slice with
        its ``start`` advanced by ``device_index * reps_local`` under
        :func:`shard_map` — the absolute-index stream contract makes the
        result BIT-IDENTICAL to the unsharded call (SURVEY §2.11 P2 for
        the flagship path; reference dispatch runner.py:1774-1886). The
        output is gathered to a replicated array so multi-process hosts
        can read all rows (the per-key path's replicated-output
        semantics)."""
        md = self._matmul_dtype
        if mesh is None:
            call = self._make_prng_call(reps, num_tiles)

            @jax.jit
            def run(seed, snr_linear, start=0):
                amp = (jnp.sqrt(0.5 / snr_linear) *
                       self._noise_gain).astype(jnp.float32)
                seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                                   jnp.asarray(start, jnp.int32)])
                return call(seeds, jnp.reshape(amp, (1,)),
                            self._g_re.astype(md), self._g_im.astype(md))

            return run

        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.shape[axis])
        if reps % n_dev:
            raise ValueError(f"reps {reps} not divisible by mesh axis "
                             f"{axis!r} size {n_dev}")
        reps_local = reps // n_dev
        call = self._make_prng_call(reps_local, num_tiles)

        def local(seeds, amp, g_re, g_im):
            # per-device start offset: device i simulates absolute
            # attempts [start + i*reps_local, start + (i+1)*reps_local)
            i = jax.lax.axis_index(axis)
            seeds = seeds.at[1].add(i * reps_local)
            return call(seeds, amp, g_re, g_im)

        sharded = shard_map(local, mesh=mesh,
                            in_specs=(P(), P(), P(), P()),
                            out_specs=P(axis), check_vma=False)
        replicated = NamedSharding(mesh, P())

        @jax.jit
        def run(seed, snr_linear, start=0):
            amp = (jnp.sqrt(0.5 / snr_linear) *
                   self._noise_gain).astype(jnp.float32)
            seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                               jnp.asarray(start, jnp.int32)])
            out = sharded(seeds, jnp.reshape(amp, (1,)),
                          self._g_re.astype(md), self._g_im.astype(md))
            return jax.lax.with_sharding_constraint(out, replicated)

        return run

    def _make_prng_call(self, reps: int, num_tiles: int):
        """The raw hardware-PRNG pallas_call over a (reps, num_tiles)
        grid; ``seed_ref = [seed, start]`` keys every stream by the
        ABSOLUTE attempt index ``start + r``."""
        tile, used_p, TLp = self._tile, self._used_p, self._TLp

        def kernel(seed_ref, amp_ref, g_re_ref, g_im_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            r_abs = seed_ref[1] + r
            # Mosaic accepts at most 2 seed values, so the second packs
            # (rep, tile, stream): even = per-rep ray stream (identical
            # for every tile of rep r, keeping the channel continuous),
            # odd = per-tile data/noise stream.
            pltpu.prng_seed(seed_ref[0], r_abs << 1)
            phase_bits = pltpu.prng_random_bits((8, TLp))
            pltpu.prng_seed(seed_ref[0],
                            ((r_abs * num_tiles + s) << 1) | 1)
            data_bits = pltpu.prng_random_bits((tile, used_p))
            n1_bits = pltpu.prng_random_bits((tile, used_p))
            n2_bits = pltpu.prng_random_bits((tile, used_p))
            out_ref[r, s] = self._simulate_block(
                phase_bits, data_bits, n1_bits, n2_bits, s, amp_ref[0],
                g_re_ref[:], g_im_ref[:])

        return pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((TLp, used_p), lambda r, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TLp, used_p), lambda r, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            # unblocked SMEM output: the buffer persists across grid
            # steps and each program writes its own (r, s) element —
            # Mosaic requires block dims (8, 128)-divisible OR equal to
            # the array dims, which rules out (1, 1) blocks here
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )

    # ------------------------------------------------------------------
    # inject mode: bits are inputs — runs under the interpreter on CPU
    # ------------------------------------------------------------------

    def build_inject(self, reps: int, num_tiles: int,
                     interpret: bool = True, mesh=None,
                     axis: str = "mc"):
        """Same math, randomness supplied as uint32 tensors:

        phase_bits (reps, 8, TLp), data/n1/n2 bits
        (reps, num_tiles * tile, used_p). Returns
        ``fn(phase_bits, data_bits, n1_bits, n2_bits, amp) ->
        (reps, num_tiles) int32``.

        ``mesh``: shard the rep axis of the bit tensors over
        ``mesh.shape[axis]`` devices with :func:`shard_map` — the
        CPU-testable twin of the sharded hardware-PRNG mode (the bits
        already carry the absolute attempt index, so no in-kernel
        offset is needed); results are bit-identical to unsharded."""
        if mesh is None:
            call = self._make_inject_call(reps, num_tiles, interpret)
        else:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(mesh.shape[axis])
            if reps % n_dev:
                raise ValueError(f"reps {reps} not divisible by mesh "
                                 f"axis {axis!r} size {n_dev}")
            local_call = self._make_inject_call(reps // n_dev, num_tiles,
                                                interpret)
            sharded = shard_map(
                local_call, mesh=mesh,
                in_specs=(P(), P(), P(), P(axis), P(axis), P(axis),
                          P(axis)),
                out_specs=P(axis), check_vma=False)
            replicated = NamedSharding(mesh, P())

            @jax.jit
            def call(amp, g_re, g_im, pb, db, n1, n2):
                out = sharded(amp, g_re, g_im, pb, db, n1, n2)
                return jax.lax.with_sharding_constraint(out, replicated)

        md = self._matmul_dtype

        def run(phase_bits, data_bits, n1_bits, n2_bits, amp):
            return call(jnp.reshape(amp, (1,)).astype(jnp.float32),
                        self._g_re.astype(md), self._g_im.astype(md),
                        phase_bits.astype(jnp.int32),
                        data_bits.astype(jnp.int32),
                        n1_bits.astype(jnp.int32),
                        n2_bits.astype(jnp.int32))

        return run

    def _make_inject_call(self, reps: int, num_tiles: int,
                          interpret: bool):
        tile, used_p, TLp = self._tile, self._used_p, self._TLp

        def kernel(amp_ref, g_re_ref, g_im_ref, pb_ref, db_ref, n1_ref,
                   n2_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            out_ref[r, s] = self._simulate_block(
                pb_ref[0], db_ref[0], n1_ref[0], n2_ref[0], s, amp_ref[0],
                g_re_ref[:], g_im_ref[:])

        return pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((TLp, used_p), lambda r, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TLp, used_p), lambda r, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TLp), lambda r, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, used_p), lambda r, s: (r, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, used_p), lambda r, s: (r, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, used_p), lambda r, s: (r, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )

    # ------------------------------------------------------------------

    @property
    def symbols_per_call(self) -> Tuple[int, int]:
        """(per_tile, bits_per_symbol) helper for throughput accounting."""
        return self._tile * self._used, self._bits_per_symbol

    @property
    def noise_gain(self) -> float:
        return self._noise_gain
