"""Multiuser precoding algorithms (layer L3): waterfilling and block
diagonalization."""

from . import blockdiagonalization, waterfilling  # noqa: F401
from .blockdiagonalization import (BDWithExtIntBase,  # noqa: F401
                                   BlockDiagonalizer, EnhancedBD,
                                   WhiteningBD,
                                   block_diagonalize,
                                   calc_receive_filter)
from .waterfilling import doWF  # noqa: F401
