"""Interference alignment solvers (layer L3)."""

from .algorithms import (AlternatingMinIASolver,  # noqa: F401
                         BruteForceStreamIASolver, ClosedFormIASolver,
                         GreedStreamIASolver, IterativeIASolverBaseClass,
                         MaxSinrIASolver, MinLeakageIASolver, MMSEIASolver)
from .iabase import IASolverBaseClass  # noqa: F401
