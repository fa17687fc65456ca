"""Subspace projections (parity: pyphysim/subspace/projections.py).

Dtype-polymorphic: numpy complex on host, CArray on device.
"""

from __future__ import annotations

import numpy as np

from ..ops import cplx
from ..ops.cplx import CArray

__all__ = ["Projection", "calcProjectionMatrix",
           "calcOrthogonalProjectionMatrix"]


def calcProjectionMatrix(A):
    """Projection matrix onto the column space of ``A``:
    ``A (A^H A)^-1 A^H`` (projections.py:96-134)."""
    if isinstance(A, CArray):
        g = cplx.matmul(A.mH, A)
        return cplx.matmul(cplx.matmul(A, cplx.inv(g)), A.mH)
    A = np.asarray(A)
    A_H = A.conj().T
    return A @ np.linalg.inv(A_H @ A) @ A_H


def calcOrthogonalProjectionMatrix(A):
    """Projection onto the orthogonal complement of span(A)
    (projections.py:137+)."""
    Q = calcProjectionMatrix(A)
    if isinstance(Q, CArray):
        n = Q.shape[-1]
        return CArray(np.eye(n) - Q.re, -Q.im)
    return np.eye(Q.shape[0]) - Q


class Projection:
    """Object API: project / reflect / orthogonal-project onto span(A)
    (projections.py:30-95)."""

    def __init__(self, A) -> None:
        self.Q = calcProjectionMatrix(A)
        self.oQ = calcOrthogonalProjectionMatrix(A)

    def project_matrix(self, M):
        if isinstance(self.Q, CArray):
            return cplx.matmul(self.Q, cplx.carray(M))
        return self.Q @ M

    def reflect_matrix(self, M):
        if isinstance(self.Q, CArray):
            n = self.Q.shape[-1]
            refl = CArray(np.eye(n) - 2 * self.Q.re, -2 * self.Q.im)
            return cplx.matmul(refl, cplx.carray(M))
        return (np.eye(self.Q.shape[0]) - 2 * self.Q) @ M

    def project_matrix_onto_orthogonal_space(self, M):
        if isinstance(self.oQ, CArray):
            return cplx.matmul(self.oQ, cplx.carray(M))
        return self.oQ @ M

    # reference-named API (projections.py:46-94)
    project = project_matrix
    reflect = reflect_matrix
    oProject = project_matrix_onto_orthogonal_space

    # the reference exposes the helpers as staticmethods of the class too
    # (projections.py:96-171)
    calcProjectionMatrix = staticmethod(calcProjectionMatrix)
    calcOrthogonalProjectionMatrix = staticmethod(
        calcOrthogonalProjectionMatrix)
