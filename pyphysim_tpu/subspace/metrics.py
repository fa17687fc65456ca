"""Subspace metrics: principal angles and chordal distances
(parity: pyphysim/subspace/metrics.py:21-199).

Dtype-polymorphic like the projections module: numpy (real or complex) on
host, :class:`~pyphysim_tpu.ops.cplx.CArray` on device. The device paths are
jittable and batch over leading axes, which is what the codebook search app
(`apps/find_codebook.py`) exploits — all O(K^2) codeword pairs are scored in
one vmapped SVD instead of a Python double loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import cplx
from ..ops.cplx import CArray
from .projections import calcProjectionMatrix

__all__ = [
    "calc_principal_angles", "calc_chordal_distance_from_principal_angles",
    "calc_chordal_distance", "calc_chordal_distance_2"
]


def calc_principal_angles(matrix1, matrix2):
    """Principal angles between the column spaces of ``matrix1`` and
    ``matrix2`` (metrics.py:21-74).

    Orthonormalize both with QR, then the singular values of ``Q1^H Q2``
    are the cosines of the principal angles (clipped to [0, 1] against
    rounding before the arccos).

    Accepts numpy arrays (host) or CArrays (device, batched over leading
    axes); returns the same flavor.
    """
    if isinstance(matrix1, CArray) or isinstance(matrix2, CArray):
        q1 = cplx.qr(cplx._coerce(matrix1))[0]
        q2 = cplx.qr(cplx._coerce(matrix2))[0]
        s = cplx.svd(cplx.matmul(q1.mH, q2), full_matrices=False)[1]
        return jnp.arccos(jnp.clip(s, 0.0, 1.0))
    q1 = np.linalg.qr(np.asarray(matrix1))[0]
    q2 = np.linalg.qr(np.asarray(matrix2))[0]
    s = np.linalg.svd(q1.conj().T @ q2, full_matrices=False)[1]
    return np.arccos(np.clip(s, -1.0, 1.0))


def calc_chordal_distance_from_principal_angles(principalAngles):
    """Chordal distance = sqrt(sum sin^2(principal angles))
    (metrics.py:78-113)."""
    if isinstance(principalAngles, jnp.ndarray):
        return jnp.sqrt(jnp.sum(jnp.sin(principalAngles) ** 2, axis=-1))
    return float(np.sqrt(np.sum(np.sin(np.asarray(principalAngles)) ** 2)))


def calc_chordal_distance(matrix1, matrix2):
    """Chordal distance via orthonormal-basis outer products:
    ``||Q1 Q1^H - Q2 Q2^H||_F / sqrt(2)`` (metrics.py:116-158).

    >>> import numpy as np
    >>> A = np.array([[1., 2], [3, 4], [5, 6]])
    >>> B = np.array([[1., 5], [3, 7], [5, -1]])
    >>> round(calc_chordal_distance(A, B), 6)
    0.516811
    """
    if isinstance(matrix1, CArray) or isinstance(matrix2, CArray):
        q1 = cplx.qr(cplx._coerce(matrix1))[0]
        q2 = cplx.qr(cplx._coerce(matrix2))[0]
        d = cplx.matmul(q1, q1.mH) - cplx.matmul(q2, q2.mH)
        return jnp.sqrt(jnp.sum(d.abs2(), axis=(-2, -1)) / 2.0)
    q1 = np.linalg.qr(np.asarray(matrix1))[0]
    q2 = np.linalg.qr(np.asarray(matrix2))[0]
    d = q1 @ q1.conj().T - q2 @ q2.conj().T
    return float(np.linalg.norm(d, "fro") / np.sqrt(2.0))


def calc_chordal_distance_2(matrix1, matrix2):
    """Chordal distance via projection matrices:
    ``||P1 - P2||_F / sqrt(2)`` (metrics.py:161-199). Same value as
    :func:`calc_chordal_distance`, different construction."""
    p1 = calcProjectionMatrix(matrix1)
    p2 = calcProjectionMatrix(matrix2)
    if isinstance(p1, CArray) or isinstance(p2, CArray):
        d = cplx._coerce(p1) - cplx._coerce(p2)
        return jnp.sqrt(jnp.sum(d.abs2(), axis=(-2, -1)) / 2.0)
    return float(np.linalg.norm(p1 - p2, "fro") / np.sqrt(2.0))
