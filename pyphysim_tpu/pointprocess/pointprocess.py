"""Uniform random point generation (parity:
pyphysim/pointprocess/pointprocess.py). Host numpy by default; pass a jax
key for device generation."""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["generate_random_points_in_circle",
           "generate_random_points_in_rectangle"]


def generate_random_points_in_circle(num_points: int, max_radius: float,
                                     min_radius: float = 0.0,
                                     rng: Optional[np.random.RandomState] = None
                                     ) -> np.ndarray:
    """Uniform points in the annulus [min_radius, max_radius] (complex),
    centered at the origin."""
    rng = rng or np.random
    # uniform AREA density over the annulus
    r2 = rng.random_sample(num_points) * (max_radius ** 2 -
                                          min_radius ** 2) + min_radius ** 2
    radius = np.sqrt(r2)
    angles = rng.random_sample(num_points) * 2 * np.pi
    return radius * np.exp(1j * angles)


def generate_random_points_in_rectangle(num_points: int, width: float,
                                        height: float,
                                        rng=None) -> np.ndarray:
    """Uniform points in a width x height rectangle centered at the
    origin (complex)."""
    rng = rng or np.random
    return (width * (0.5 - rng.random_sample(num_points)) +
            1j * height * (0.5 - rng.random_sample(num_points)))
