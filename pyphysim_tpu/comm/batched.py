"""Device-batched Block Diagonalization (jit/vmap-able).

TPU-native counterpart of the host :class:`~.BlockDiagonalizer`
(reference blockdiagonalization.py:181-663) for the Monte Carlo hot path:
one jitted program computes the BD precoders for a whole batch of joint
CoMP channels at once, instead of a per-realization Python loop of numpy
SVDs. The algorithm is [Spencer2004] exactly as in the reference:

1. per user k, the precoder lives in the null space of the other users'
   stacked rows ``tilde_H_k`` (blockdiagonalization.py:272-363) — here
   the last ``nS`` right singular vectors of a full-matrices batched SVD,
2. a second (thin) SVD inside the null space aligns per-user streams and
   yields the effective singular values,
3. power loading: global water-filling (blockdiagonalization.py:365-401),
   per-BS normalized water-filling (:403-464), or equal per-BS power
   (:510-565), all branch-free.

Static-shape restriction (vs the host class): the number of streams per
user is fixed from the shapes, ``nS = Nt_total - (K-1) * Nr_per_user``,
i.e. the generic full-rank case — Monte Carlo channel draws are full rank
almost surely. The host object API remains the tool for degenerate
channels where the rank must be inspected.

The null-space basis of an SVD has arbitrary order/phase, so the
precoders returned here are not element-wise equal to the host ones —
the block-diagonalized channel, per-user singular values, power
constraints and capacities are (tests cross-check all four).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops import cplx
from ..ops.cplx import CArray
from .waterfilling import doWF_jit

__all__ = ["bd_precoders_batched", "bd_receive_filter_batched"]


def _user_rows(H: CArray, k: int, nr_u: int) -> CArray:
    return H[..., k * nr_u:(k + 1) * nr_u, :]


def _other_rows(H: CArray, k: int, nr_u: int) -> CArray:
    parts = []
    if k > 0:
        parts.append(H[..., :k * nr_u, :])
    if (k + 1) * nr_u < H.shape[-2]:
        parts.append(H[..., (k + 1) * nr_u:, :])
    if len(parts) == 1:
        return parts[0]
    return cplx.concatenate(parts, axis=-2)


def bd_precoders_batched(H: CArray, num_users: int, iPu: float,
                         noise_var: float = 0.0,
                         mode: str = "normalized"
                         ) -> Tuple[CArray, CArray, jnp.ndarray]:
    """Block-diagonalization precoders for a (batch of) joint channel(s).

    Parameters
    ----------
    H : CArray, shape (..., K*Nr_u, Nt_total)
        Joint CoMP channel (all users' receive antennas stacked).
    num_users : int
        K (static).
    iPu : float
        Power available per transmitting base station.
    noise_var : float
        Noise variance (used by the water-filling modes).
    mode : str
        ``"global"`` — global water-filling over all streams
        (blockdiagonalization.py:466-509 with global scaling),
        ``"normalized"`` — global WF then rescaled so no BS exceeds iPu
        (the reference's default ``block_diagonalize``),
        ``"none"`` — equal per-BS power
        (``block_diagonalize_no_waterfilling``).

    Returns
    -------
    (newH, Ms, Sigma) : newH = H @ Ms is block-diagonal; Ms are the
    precoders (..., Nt_total, K*nS_kept); Sigma the per-stream effective
    singular values before power loading.
    """
    K = int(num_users)
    nr_tot, nt_tot = H.shape[-2], H.shape[-1]
    if nr_tot % K != 0:
        raise ValueError(
            "Number of rows of the channel must be a multiple of the "
            "number of users.")
    nr_u = nr_tot // K
    nS = nt_tot - (K - 1) * nr_u
    if nS <= 0:
        raise ValueError(
            f"No null-space dimensions left: Nt_total={nt_tot} <= "
            f"(K-1)*Nr_u={(K - 1) * nr_u}")
    kept = nS - max(nr_u - nS, 0)  # streams surviving the second SVD

    ms_blocks = []
    sig_blocks = []
    for k in range(K):
        tilde_H = _other_rows(H, k, nr_u)
        _, _, vh = cplx.svd(tilde_H, full_matrices=True)
        tilde_V0 = vh.mH[..., :, nt_tot - nS:]       # null-space basis
        A = cplx.matmul(_user_rows(H, k, nr_u), tilde_V0)
        _, s1, v1h = cplx.svd(A)                      # descending
        ms_blocks.append(cplx.matmul(tilde_V0, v1h.mH[..., :, :kept]))
        sig_blocks.append(s1[..., :kept])
    Ms_bad = cplx.concatenate(ms_blocks, axis=-1)     # (..., Nt, K*kept)
    Sigma = jnp.concatenate(sig_blocks, axis=-1)      # (..., K*kept)

    if mode in ("global", "normalized"):
        opt_p, _ = doWF_jit(Sigma ** 2, K * iPu, noise_var)
        Ms = CArray(Ms_bad.re * jnp.sqrt(opt_p)[..., None, :],
                    Ms_bad.im * jnp.sqrt(opt_p)[..., None, :])
        if mode == "normalized":
            # rescale so the most-loaded BS transmits exactly iPu
            # (blockdiagonalization.py:403-464)
            norms = []
            for k in range(K):
                blk = Ms[..., :, k * kept:(k + 1) * kept]
                norms.append(jnp.sqrt(
                    jnp.sum(blk.re ** 2 + blk.im ** 2, axis=(-2, -1))))
            max_norm = jnp.max(jnp.stack(norms, axis=-1), axis=-1)
            scale = (jnp.sqrt(iPu) /
                     jnp.maximum(max_norm, 1e-30))[..., None, None]
            Ms = CArray(Ms.re * scale, Ms.im * scale)
    elif mode == "none":
        blocks = []
        for k in range(K):
            blk = Ms_bad[..., :, k * kept:(k + 1) * kept]
            norm = jnp.sqrt(jnp.sum(blk.re ** 2 + blk.im ** 2,
                                    axis=(-2, -1), keepdims=True))
            s = jnp.sqrt(iPu) / jnp.maximum(norm, 1e-30)
            blocks.append(CArray(blk.re * s, blk.im * s))
        Ms = cplx.concatenate(blocks, axis=-1)
    else:
        raise ValueError(f"Unknown mode: {mode!r}")

    newH = cplx.matmul(H, Ms)
    return newH, Ms, Sigma


def bd_receive_filter_batched(newH: CArray) -> CArray:
    """ZF receive filter: pseudo-inverse of the block-diagonalized
    channel (blockdiagonalization.py:567-584), batched."""
    return cplx.pinv(newH)
