"""Multiuser precoding algorithms (layer L3): waterfilling and block
diagonalization."""

from . import batched, blockdiagonalization, waterfilling  # noqa: F401
from .batched import (bd_precoders_batched,  # noqa: F401
                      bd_receive_filter_batched)
from .blockdiagonalization import (BDWithExtIntBase,  # noqa: F401
                                   BlockDiagonalizer, EnhancedBD,
                                   WhiteningBD,
                                   block_diagonalize,
                                   calc_receive_filter)
from .waterfilling import doWF, doWF_jit  # noqa: F401
