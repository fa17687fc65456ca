"""Monolithic BD CoMP capacity Monte-Carlo Pallas kernel.

VMEM-resident counterpart of the batched Block Diagonalization sweep
(``comm/batched.bd_precoders_batched`` + normalized water-filling +
sum capacity — reference ``comm/blockdiagonalization.py:181-663`` /
the comp_BD app family) for the bench scenario K=3, Nr_u=2,
Nt_total=6: each (row, lane) element draws its own 6x6 joint channel
from the in-kernel TPU PRNG and runs the ENTIRE solve as pure plane
arithmetic (:mod:`.pallas_planes`) — the projector-route null space
via a 2x2-block Schur solve, closed-form 2x2 Hermitian eigenvalues,
the rank-based branch-free water-filling of
:func:`~..comm.waterfilling.doWF_jit`, and the per-BS normalization —
with one f32 capacity sum per grid step as the only HBM traffic.

Two algebraic collapses make the kernel far smaller than the XLA
chain it mirrors:

* only the per-user effective singular VALUES are needed for
  capacity: the stream-aligned null-space basis ``V = T^H U / s`` has
  orthonormal columns, so the per-stream transmit powers after
  water-filling and per-BS rescaling are the water-filling powers
  themselves — ``V`` (and the 6x6 precoder matrix) is never formed;
* the null-space system ``B X = tilde_H`` with ``B = tilde_H
  tilde_H^H`` (4x4 HPD) splits into two closed-form 2x2 Hermitian
  solves through one Schur complement — the plane-arithmetic instance
  of :func:`~.cplx.hpd_inv`'s recursion.

The math is pinned per-batch against the XLA chain on identical
channel realizations (inject mode, tests/test_bd_pallas.py); the XLA
path (``comm/batched.py``) remains the general-geometry tool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc_pallas import _u11
from .pallas_planes import (EPS, cabs2, cadd, cmul, cmulc, csub, gram_rows,
                            herm2_eigvals, herm2_solve_cols, mat_H, mat_mul,
                            mat_sub)

__all__ = ["MonteCarloBD", "CH_PLANES"]

K = 3
NR = 2
NT = K * NR                      # 6 (square CoMP bench geometry)
CH_PLANES = NT * NT * 2          # 72
_CLIP = 0.99999994


class MonteCarloBD:
    """Builder for the single-kernel BD CoMP capacity sweep (K=3,
    Nr_u=2, Nt_total=6, normalized water-filling — the bench's
    ``bd_step`` scenario, bench.py).

    ``tile`` rows x ``lane`` lanes of independent realizations per
    grid step. Solves per call: ``reps * num_tiles * tile * lane``.
    """

    def __init__(self, tile: int = 8, lane: int = 512,
                 iPu: float = 10.0 / 3, noise_var: float = 1.0) -> None:
        if tile < 8 or tile % 8:
            raise ValueError("tile must be a multiple of 8")
        if lane < 128 or lane % 128:
            raise ValueError("lane must be a multiple of 128")
        self._tile = int(tile)
        self._lane = int(lane)
        self._iPu = float(iPu)
        self._nv = float(noise_var)

    # ------------------------------------------------------------------

    def _solve_block(self, planes, noise_var=None, iPu=None):
        """planes: CH_PLANES (tile, lane) bit planes -> (tile, lane)
        f32 capacity (0 for degenerate/invalid draws). ``noise_var`` /
        ``iPu`` override the constructor values with traced scalars
        (used by the test harness to share one compiled program)."""

        def gauss(bits):
            return jax.lax.erf_inv(jnp.clip(_u11(bits), -_CLIP, _CLIP))

        # H as a (6, 6) plane matrix; components ~ N(0, 1/2) per part
        H = []
        idx = 0
        for i in range(NT):
            row = []
            for j in range(NT):
                row.append((gauss(planes[idx]), gauss(planes[idx + 1])))
                idx += 2
            H.append(row)

        gains = []
        for k in range(K):
            others = [i for i in range(NT) if i // NR != k]
            t_top = [H[others[0]], H[others[1]]]
            t_bot = [H[others[2]], H[others[3]]]
            Hk = [H[NR * k], H[NR * k + 1]]
            # B = tilde tilde^H, solved blockwise (Schur complement):
            A = gram_rows(t_top)
            D = gram_rows(t_bot)
            C = mat_mul(t_top, mat_H(t_bot))          # (2, 2)
            Ai_ttop = herm2_solve_cols(A, t_top)      # A^{-1} t_top
            Ai_C = herm2_solve_cols(A, C)             # A^{-1} C
            CH_ = mat_H(C)
            M = mat_mul(CH_, Ai_C)                    # C^H A^{-1} C
            S = (D[0] - M[0][0][0],
                 csub(D[1], M[0][1]),
                 D[2] - M[1][1][0])
            rhs_bot = mat_sub(t_bot, mat_mul(CH_, Ai_ttop))
            Xb = herm2_solve_cols(S, rhs_bot)         # (2, 6)
            Xt = mat_sub(Ai_ttop, mat_mul(Ai_C, Xb))  # (2, 6)
            # T = Hk (I - tilde^H B^{-1} tilde) = Hk - Y_top Xt - Y_bot Xb
            Y_top = mat_mul(Hk, mat_H(t_top))         # (2, 2)
            Y_bot = mat_mul(Hk, mat_H(t_bot))
            T = mat_sub(mat_sub(Hk, mat_mul(Y_top, Xt)),
                        mat_mul(Y_bot, Xb))
            l0, l1 = herm2_eigvals(gram_rows(T))
            gains.append(jnp.maximum(l0, 0.0))        # sigma^2, desc
            gains.append(jnp.maximum(l1, 0.0))

        # branch-free water-filling over the 6 stream gains — the
        # plane-arithmetic instance of comm/waterfilling.doWF_jit
        nv = (jnp.float32(self._nv) if noise_var is None
              else jnp.asarray(noise_var, jnp.float32))
        ipu = (jnp.float32(self._iPu) if iPu is None
               else jnp.asarray(iPu, jnp.float32))
        total_power = jnp.float32(K) * ipu
        inv = [nv / jnp.maximum(g, EPS) for g in gains]
        n = len(inv)
        rank = []
        for i in range(n):
            r_i = jnp.zeros_like(inv[0])
            for j in range(n):
                if j == i:
                    continue
                lt = (inv[j] < inv[i]).astype(jnp.float32)
                tie = ((inv[j] == inv[i]) &
                       (j < i)).astype(jnp.float32)
                r_i = r_i + lt + tie
            rank.append(r_i)
        mu_ks, feas = [], []
        for kk in range(n):
            sel = [(rank[i] <= kk).astype(jnp.float32) for i in range(n)]
            cum_inv = sum(s * v for s, v in zip(sel, inv))
            at_k = [(rank[i] == kk).astype(jnp.float32)
                    for i in range(n)]
            worst = sum(a * v for a, v in zip(at_k, inv))
            mu_k = (total_power + cum_inv) / jnp.float32(kk + 1)
            mu_ks.append(mu_k)
            feas.append((mu_k >= worst).astype(jnp.float32))
        kept = sum(feas)                        # the optimum keeps the
        mu = sum(m * (kept == jnp.float32(kk + 1)).astype(jnp.float32)
                 for kk, m in enumerate(mu_ks))  # most channels
        powers = [jnp.maximum(mu - v, 0.0) for v in inv]

        # per-BS normalization (blockdiagonalization.py:403-464): the
        # stream basis columns are orthonormal, so the per-user block
        # power is just the sum of its stream powers
        user_p = [powers[2 * k] + powers[2 * k + 1] for k in range(K)]
        max_p = jnp.maximum(jnp.maximum(user_p[0], user_p[1]),
                            user_p[2])
        scale2 = ipu / jnp.maximum(max_p, EPS)

        cap = None
        for p, g in zip(powers, gains):
            c = jnp.log2(1.0 + p * scale2 * g)
            cap = c if cap is None else cap + c

        # degeneracy guard — scale-relative, as in bench.py bd_step and
        # comm/batched._bd_conditioning_ok
        smax = gains[0]
        smin = gains[0]
        for g in gains[1:]:
            smax = jnp.maximum(smax, g)
            smin = jnp.minimum(smin, g)
        ok = jnp.sqrt(smin) > 1e-6 * jnp.sqrt(smax)
        return jnp.where(jnp.isfinite(cap) & ok, cap, 0.0)

    # ------------------------------------------------------------------

    def build(self, reps: int, num_tiles: int):
        """Jitted ``(seed:int32[, start]) -> (reps, num_tiles) f32``
        per-tile capacity sums; channels from the hardware PRNG with
        streams keyed by the ABSOLUTE repetition index."""
        tile, lane = self._tile, self._lane

        def kernel(seed_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            r_abs = seed_ref[1] + r
            pltpu.prng_seed(seed_ref[0], r_abs * num_tiles + s)
            planes = [pltpu.prng_random_bits((tile, lane))
                      for _ in range(CH_PLANES)]
            out_ref[r, s] = jnp.sum(self._solve_block(planes))

        call = pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )

        @jax.jit
        def run(seed, start=0):
            seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                               jnp.asarray(start, jnp.int32)])
            return call(seeds)

        return run

    def build_inject(self, reps: int, num_tiles: int,
                     interpret: bool = True):
        """Same math with the channel bits supplied as ONE uint32
        tensor ``(reps, num_tiles * tile, CH_PLANES * lane)`` (plane i
        at lanes [i*lane, (i+1)*lane)): ``fn(ch_bits) ->
        (reps, num_tiles) f32``."""
        tile, lane = self._tile, self._lane

        def kernel(ch_ref, out_ref):
            r = pl.program_id(0)
            s = pl.program_id(1)
            block = ch_ref[0]
            planes = [block[:, i * lane:(i + 1) * lane]
                      for i in range(CH_PLANES)]
            out_ref[r, s] = jnp.sum(self._solve_block(planes))

        call = pl.pallas_call(
            kernel,
            grid=(reps, num_tiles),
            out_shape=jax.ShapeDtypeStruct((reps, num_tiles),
                                           jnp.float32),
            in_specs=[
                pl.BlockSpec((1, tile, CH_PLANES * lane),
                             lambda r, s: (r, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )

        def run(ch_bits):
            return call(ch_bits.astype(jnp.int32))

        return run

    # ------------------------------------------------------------------

    @property
    def solves_per_grid_step(self) -> int:
        return self._tile * self._lane
