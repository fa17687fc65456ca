"""Subspace utilities: projections and principal angles."""

from .projections import (Projection, calcOrthogonalProjectionMatrix,  # noqa: F401
                          calcProjectionMatrix)
