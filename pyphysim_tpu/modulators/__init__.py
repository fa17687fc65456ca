"""Digital modulators (layer L1): PSK/QAM/BPSK/QPSK and OFDM."""

from .fundamental import (BPSK, PSK, QAM, QPSK, Modulator)  # noqa: F401
from .ofdm import OFDM, OfdmOneTapEqualizer  # noqa: F401
