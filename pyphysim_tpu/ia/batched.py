"""Batched, jittable interference alignment (Max-SINR family).

The host-side solvers in :mod:`.algorithms` mirror the reference's
object API with data-dependent convergence. For Monte Carlo at TPU scale
a different shape wins: FIXED-iteration Max-SINR expressed entirely on
:class:`~pyphysim_tpu.ops.cplx.CArray` tensors, vmappable over thousands
of channel realizations and runnable inside one jitted sweep program.

Channel layout: dense ``H`` of shape ``(K, K, Nr, Nt)`` (receiver k,
transmitter l) — the TPU-native form of the reference's
matrix-of-matrices (SURVEY §7). All K/Ns loops unroll at trace time
(K and Ns are small and static).

Algorithm parity: [Cadambe2008] max-SINR iteration exactly as the
reference's MaxSinrIASolver (algorithms.py:1243-1504) — per-stream
filters ``U_kl = B_kl^-1 H_kk V_kl`` in the forward network and the same
in the reverse network (``H_rev_kl = H_lk^H``) for the precoders —
but with a fixed iteration count instead of a convergence test
(bounded-iteration jittable form, SURVEY §7 'hard parts').
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import cplx
from ..ops.cplx import CArray

__all__ = ["max_sinr_solve", "calc_sinrs", "sum_capacity",
           "random_unit_precoders"]


def _normalize_fro(f: CArray) -> CArray:
    nrm = jnp.sqrt(jnp.sum(f.abs2(), axis=(-2, -1), keepdims=True))
    return CArray(f.re / nrm, f.im / nrm)


def random_unit_precoders(key: jax.Array, K: int, Nt: int,
                          Ns: int) -> CArray:
    """Random unit-Frobenius-norm precoders, shape (K, Nt, Ns)."""
    from ..utils.misc import randn_c
    f = randn_c(key, K, Nt, Ns)
    return _normalize_fro(f)


def _bkl_covariances(H: CArray, F: CArray, k: int, noise_var,
                     P, Ns: int) -> list:
    """Bkl (eq. 28) for all streams of user k. ``F``: (K, Nt, Ns)
    normalized; powers P (K,)."""
    K = H.shape[0]
    Nr = H.shape[2]
    eye = cplx.eye(Nr)
    first = CArray(noise_var * eye.re, eye.im * 0.0)
    for j in range(K):
        scale = P[j] / Ns
        hf = cplx.matmul(H[k, j], F[j])          # (Nr, Ns)
        gram = cplx.matmul(hf, hf.mH)
        first = first + CArray(gram.re * scale, gram.im * scale)
    out = []
    hkk_f = cplx.matmul(H[k, k], F[k])           # (Nr, Ns)
    for l in range(Ns):
        v = hkk_f[..., :, l:l + 1]
        second = cplx.matmul(v, v.mH)
        scale = P[k] / Ns
        out.append(first - CArray(second.re * scale, second.im * scale))
    return out


def _update_filters(H: CArray, F: CArray, noise_var, P,
                    Ns: int) -> CArray:
    """Per-stream max-SINR receive filters U (K, Nr, Ns)."""
    K = H.shape[0]
    us = []
    for k in range(K):
        bkls = _bkl_covariances(H, F, k, noise_var, P, Ns)
        cols = []
        hkk_f = cplx.matmul(H[k, k], F[k])
        for l in range(Ns):
            rhs = hkk_f[..., :, l:l + 1]
            ukl = cplx.solve(bkls[l], rhs)
            nrm = jnp.sqrt(jnp.sum(ukl.abs2(), axis=(-2, -1),
                                   keepdims=True))
            cols.append(CArray(ukl.re / nrm, ukl.im / nrm))
        uk = cplx.concatenate(cols, axis=-1)
        us.append(_normalize_fro(uk))
    return cplx.stack(us, axis=0)


def max_sinr_solve(H: CArray, key: jax.Array, Ns: int = 1,
                   P: float = 1.0, noise_var: float = 0.1,
                   iterations: int = 20) -> Tuple[CArray, CArray]:
    """Fixed-iteration Max-SINR IA.

    ``H``: (K, K, Nr, Nt) CArray. Returns ``(F, U)`` with
    F (K, Nt, Ns) normalized precoders and U (K, Nr, Ns) receive
    filters. vmap over leading axes of H/key for Monte Carlo batches.
    """
    K = H.shape[0]
    p_vec = jnp.full((K,), P)
    F = random_unit_precoders(key, K, int(H.shape[3]), Ns)
    # reverse network channel: H_rev[k, l] = H[l, k]^H
    Hrev = cplx.stack([
        cplx.stack([H[l, k].mH for l in range(K)], axis=0)
        for k in range(K)], axis=0)

    def body(carry, _):
        F_cur = carry
        U = _update_filters(H, F_cur, noise_var, p_vec, Ns)
        F_new = _update_filters(Hrev, U, noise_var, p_vec, Ns)
        return F_new, 0

    F, _ = jax.lax.scan(body, F, jnp.arange(iterations))
    U = _update_filters(H, F, noise_var, p_vec, Ns)
    return F, U


def calc_sinrs(H: CArray, F: CArray, U: CArray, noise_var,
               P: float = 1.0) -> jnp.ndarray:
    """Per-stream SINRs, shape (K, Ns) (Cadambe2008 eq. 28/29)."""
    K = H.shape[0]
    Ns = F.shape[-1]
    p_vec = jnp.full((K,), P)
    rows = []
    for k in range(K):
        bkls = _bkl_covariances(H, F, k, noise_var, p_vec, Ns)
        hkk_f = cplx.matmul(H[k, k], F[k])
        scale = P / Ns
        vals = []
        for l in range(Ns):
            ukl = U[k][..., :, l:l + 1]
            aux = cplx.matmul(ukl.mH, hkk_f[..., :, l:l + 1])
            num = scale * aux.abs2()[..., 0, 0]
            den = cplx.matmul(ukl.mH, cplx.matmul(bkls[l], ukl))
            vals.append(num / jnp.abs(den.re[..., 0, 0]))
        rows.append(jnp.stack(vals, axis=-1))
    return jnp.stack(rows, axis=-2)


def sum_capacity(sinrs: jnp.ndarray) -> jnp.ndarray:
    """``sum log2(1 + sinr)`` over streams and users."""
    return jnp.sum(jnp.log2(1.0 + sinrs), axis=(-2, -1))
