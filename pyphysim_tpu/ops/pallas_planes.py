"""Complex "plane arithmetic" helpers for Pallas Monte Carlo kernels.

Inside a TPU kernel the natural data layout is one (rows, lanes) f32
plane per real scalar: a complex number is a (re, im) tuple of planes,
a matrix a nested list of complex tuples. Everything below is pure
elementwise VPU arithmetic — no gathers, no lax.linalg — shared by the
Max-SINR IA kernel (:mod:`.ia_pallas`) and the BD CoMP kernel
(:mod:`.bd_pallas`).

2x2 Hermitian matrices are ``(p, q, r)`` triples with real planes
``p, r`` on the diagonal and complex ``q`` above it.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-30


# ---- complex scalars -----------------------------------------------------

def cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def cmulc(a, b):
    """a * conj(b)."""
    return (a[0] * b[0] + a[1] * b[1], a[1] * b[0] - a[0] * b[1])


def cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def cscale(a, s):
    return (a[0] * s, a[1] * s)


def cconj(a):
    return (a[0], -a[1])


def cabs2(a):
    return a[0] * a[0] + a[1] * a[1]


def czero_like(x):
    z = jnp.zeros_like(x[0])
    return (z, z)


# ---- generic complex matrices (lists of lists of complex tuples) ---------

def mat_H(M):
    """Conjugate transpose."""
    rows, cols = len(M), len(M[0])
    return [[cconj(M[i][j]) for i in range(rows)] for j in range(cols)]


def mat_mul(A, B):
    """Complex matmul of plane matrices: (m, k) x (k, n)."""
    m, k, n = len(A), len(B), len(B[0])
    out = []
    for i in range(m):
        row = []
        for j in range(n):
            acc = cmul(A[i][0], B[0][j])
            for t in range(1, k):
                acc = cadd(acc, cmul(A[i][t], B[t][j]))
            row.append(acc)
        out.append(row)
    return out


def mat_sub(A, B):
    return [[csub(a, b) for a, b in zip(ra, rb)]
            for ra, rb in zip(A, B)]


def gram_rows(M):
    """M M^H of an (2, n) plane matrix as a 2x2 Hermitian (p, q, r)."""
    p = cabs2(M[0][0])
    r = cabs2(M[1][0])
    q = cmulc(M[0][0], M[1][0])
    for j in range(1, len(M[0])):
        p = p + cabs2(M[0][j])
        r = r + cabs2(M[1][j])
        q = cadd(q, cmulc(M[0][j], M[1][j]))
    return (p, q, r)


# ---- 2x2 Hermitian closed forms ------------------------------------------

def herm2_solve_cols(B, M):
    """B^{-1} M for Hermitian 2x2 B = (p, q, r) and a (2, n) plane
    matrix M — the adjugate route of ops/cplx.solve at n=2 (callers
    either normalize the result or fold the det into a later scale)."""
    p, q, r = B
    det = p * r - cabs2(q)
    inv = 1.0 / jnp.where(jnp.abs(det) > EPS, det,
                          jnp.where(det >= 0, EPS, -EPS))
    out = []
    n = len(M[0])
    top, bot = [], []
    for j in range(n):
        v0, v1 = M[0][j], M[1][j]
        top.append(cscale(csub(cscale(v0, r), cmul(q, v1)), inv))
        bot.append(cscale(csub(cscale(v1, p), cmulc(v0, q)), inv))
    out.append(top)
    out.append(bot)
    return out


def herm2_eigvals(B):
    """Both eigenvalues of Hermitian 2x2 (p, q, r), (max, min)."""
    p, q, r = B
    mid = 0.5 * (p + r)
    h = 0.5 * (p - r)
    root = jnp.sqrt(h * h + cabs2(q))
    return mid + root, mid - root
