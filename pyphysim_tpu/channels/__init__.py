"""Channel models (layer L2): fading generators, TDL channels, single/multi
user wrappers, path loss, noise, antenna gain."""

from . import (antennagain, fading, fading_generators, multiuser,  # noqa: F401
               noise, pathloss, singleuser)
from .fading import (COST259_HTx, COST259_RAx, COST259_TUx,  # noqa: F401
                     TdlChannel, TdlChannelProfile, TdlImpulseResponse,
                     TdlMimoChannel)
from .fading_generators import (JakesSampleGenerator,  # noqa: F401
                                RayleighSampleGenerator)
from .multiuser import (MuChannel, MuMimoChannel,  # noqa: F401
                        MultiUserChannelMatrix,
                        MultiUserChannelMatrixExtInt)
from .singleuser import SuChannel, SuMimoChannel  # noqa: F401
