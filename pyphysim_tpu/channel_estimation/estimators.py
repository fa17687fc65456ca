"""LS and MMSE channel estimators (Fodor et al. 2014 formulations).

Behavioral counterpart of
``pyphysim/channel_estimation/estimators.py:12-213``, vectorized over a
leading realizations axis instead of a Python loop (the reference iterates
per realization; here the estimate is one batched expression that also
works on jnp arrays inside jit).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

__all__ = ["compute_ls_estimation", "compute_theoretical_ls_MSE",
           "compute_mmse_estimation", "compute_theoretical_mmse_MSE"]


def _xp(*arrays):
    return jnp if any(isinstance(a, jnp.ndarray) for a in arrays) else np


def compute_ls_estimation(Y_p, s):
    """LS channel estimate ``Y s^H (s s^H)^-1``.

    ``Y_p``: (..., Nr, num_pilots); ``s``: (Nt, num_pilots) shared or
    (..., Nt, num_pilots) per realization. Returns (..., Nr, Nt).
    """
    xp = _xp(Y_p, s)
    sH = xp.conj(xp.swapaxes(s, -1, -2))
    gram = xp.matmul(s, sH)
    return xp.matmul(xp.matmul(Y_p, sH), xp.linalg.inv(gram))


def compute_theoretical_ls_MSE(Nr: int, noise_power: float, alpha: float,
                               pilot_power: float,
                               num_pilots: int) -> float:
    """``Nr sigma^2 / (alpha^2 P Np)``."""
    return Nr * noise_power / ((alpha ** 2) * pilot_power * num_pilots)


def compute_mmse_estimation(Y_p, s, noise_power: float, C):
    """MMSE channel estimate for a SIMO channel (Nt must be 1):
    ``inv(sigma^2 I + Np C) C (Y s^H) * Np / (s s^H)``.

    ``Y_p``: (..., Nr, num_pilots); ``s``: (1, num_pilots) or
    (..., 1, num_pilots); ``C``: (Nr, Nr) channel covariance.
    """
    xp = _xp(Y_p, s, C)
    num_pilots = Y_p.shape[-1]
    Nr = Y_p.shape[-2]
    sH = xp.conj(xp.swapaxes(s, -1, -2))          # (..., Np, 1)
    if s.shape[-2] != 1:
        raise AssertionError(
            "compute_mmse_estimation only supports Nt == 1")
    y_corr = xp.matmul(Y_p, sH)                   # (..., Nr, 1)
    pilot_energy = xp.matmul(s, sH)[..., 0, 0]    # (...,)
    eye = xp.eye(Nr)
    filt = xp.matmul(xp.linalg.inv(noise_power * eye + num_pilots * C), C)
    est = xp.matmul(filt, y_corr)                  # (..., Nr, 1)
    return est * (num_pilots / pilot_energy)[..., None, None] if \
        xp.ndim(pilot_energy) else est * (num_pilots / pilot_energy)


def compute_theoretical_mmse_MSE(Nr: int, noise_power: float, alpha: float,
                                 pilot_power: float, num_pilots: int,
                                 C) -> float:
    """``tr[C inv(I + alpha^2 P Np / sigma^2 C)]``."""
    xp = _xp(C)
    return float(np.real(xp.trace(
        xp.matmul(C, xp.linalg.inv(
            xp.eye(Nr) +
            alpha ** 2 * pilot_power * num_pilots / noise_power * C)))))
