"""CAZAC-based frequency-domain channel estimation.

Behavioral counterpart of
``pyphysim/reference_signals/channel_estimation.py:15-200``: correlate the
received reference signal with the conjugated user sequence, go to the
delay domain (IFFT), keep the first taps, and FFT back (with the comb
x``size_multiplier`` interpolation used for SRS).

Accepts numpy (host) or CArray (device) received signals; the device path
uses the matmul-DFT.
"""

from __future__ import annotations

import numpy as np

from ..ops import cplx
from ..ops import fft as cfft
from ..ops.cplx import CArray

__all__ = ["CazacBasedChannelEstimator",
           "CazacBasedWithOCCChannelEstimator"]


class CazacBasedChannelEstimator:
    """Channel estimator for CAZAC reference sequences (SRS/DMRS)."""

    def __init__(self, ue_ref_seq, size_multiplier: int = 2) -> None:
        # accept UeSequence objects or plain arrays
        self._normalized_ref_seq = getattr(ue_ref_seq, "normalized", False)
        if hasattr(ue_ref_seq, "seq_array"):
            ue_ref_seq = ue_ref_seq.seq_array()
        self._ue_ref_sequence = np.asarray(ue_ref_seq)
        self._size_multiplier = int(size_multiplier)

    @property
    def ue_ref_seq(self) -> np.ndarray:
        return self._ue_ref_sequence

    def estimate_channel_freq_domain(self, received_signal,
                                     num_taps_to_keep: int):
        """Estimate the channel frequency response.

        ``received_signal``: (..., Nsc) — the reference signal after the
        channel, possibly with a leading receive-antenna axis. Returns the
        response at ``size_multiplier * Nsc`` subcarriers.
        """
        r = self._ue_ref_sequence
        if isinstance(received_signal, CArray):
            rc = cplx.from_numpy(np.conj(r))
            prod = received_signal * rc
            y = cfft.ifft(prod)
            tilde_h = y[..., :num_taps_to_keep + 1]
            tilde_H = cfft.fft(tilde_h,
                               n=self._size_multiplier * r.size)
            if self._normalized_ref_seq:
                tilde_H = tilde_H * float(r.size)
            return tilde_H
        received_signal = np.asarray(received_signal)
        y = np.fft.ifft(np.conj(r) * received_signal, r.size, axis=-1)
        tilde_h = y[..., :num_taps_to_keep + 1]
        tilde_H = np.fft.fft(tilde_h, self._size_multiplier * r.size,
                             axis=-1)
        if self._normalized_ref_seq:
            tilde_H = tilde_H * r.size
        return tilde_H


class CazacBasedWithOCCChannelEstimator(CazacBasedChannelEstimator):
    """CAZAC estimation with an Orthogonal Cover Code: average the
    (cover-code-decoded) slots before the standard estimation
    (channel_estimation.py:134-200)."""

    def __init__(self, ue_ref_seq) -> None:
        cover_code = ue_ref_seq.cover_code
        seq = ue_ref_seq.seq_array()
        reference_seq = seq[0] * cover_code[0]
        super().__init__(reference_seq, size_multiplier=1)
        self._normalized_ref_seq = ue_ref_seq.normalized
        self._cover_code = np.asarray(cover_code)

    @property
    def cover_code(self) -> np.ndarray:
        return self._cover_code

    def estimate_channel_freq_domain(self, received_signal,
                                     num_taps_to_keep: int,
                                     extra_dimension: bool = True):
        """``received_signal``: (..., num_slots, Nsc) when
        ``extra_dimension`` — decoded with the cover code and averaged
        over slots, then estimated."""
        cc = self._cover_code
        if extra_dimension:
            if isinstance(received_signal, CArray):
                ccb = np.asarray(cc, dtype=np.float32)[:, None]
                received_signal = CArray(
                    (received_signal.re * ccb).mean(axis=-2),
                    (received_signal.im * ccb).mean(axis=-2))
            else:
                received_signal = np.asarray(received_signal)
                decoded = received_signal * cc[..., :, np.newaxis]
                received_signal = decoded.mean(axis=-2)
        return super().estimate_channel_freq_domain(received_signal,
                                                    num_taps_to_keep)
