"""Numeric utilities (layer L0): conversions, complex RNG, bit ops, linalg."""

from . import conversion, misc, serialize  # noqa: F401
