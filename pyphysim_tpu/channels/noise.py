"""Thermal noise power (parity: pyphysim/channels/noise.py:11-33)."""

from __future__ import annotations

import numpy as np
import scipy.constants

from ..utils.conversion import dBm2Linear, linear2dBm

__all__ = ["calc_thermal_noise_power_dBm", "calc_thermal_noise_power"]


def calc_thermal_noise_power_dBm(T: float, delta_f: float) -> float:
    """Thermal noise power (dBm) in bandwidth ``delta_f`` (Hz) at
    temperature ``T`` (Kelvin): ``k T delta_f``."""
    noise_var = scipy.constants.Boltzmann * T * delta_f
    return float(linear2dBm(noise_var))


def calc_thermal_noise_power(T: float, delta_f: float) -> float:
    """Thermal noise power (Watts) in bandwidth ``delta_f`` at
    temperature ``T``."""
    return float(scipy.constants.Boltzmann * T * delta_f)
