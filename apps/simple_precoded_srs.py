#!/usr/bin/env python
"""Precoded SRS estimation of equivalent uplink channels, with SIC.

Counterpart of the reference's ``apps/simple_precoded_srs.py``: three UEs,
each precoding its sounding reference signal (distinct Zadoff-Chu roots,
comb-2 pattern) toward its own access node over COST259 TDL channels; every
AN estimates the equivalent (precoded) channel of ALL UEs by
root-correlation + delay-domain truncation, and a successive interference
cancellation (SIC) pass re-estimates the cross channels after subtracting
the direct one. Reports the per-link estimation MSE and the SIC gain.

The estimation math is the framework's CazacBasedChannelEstimator
(reference_signals/channel_estimation.py:15-160 in the reference); plots
are optional matplotlib (the reference used bokeh).

Run:  python apps/simple_precoded_srs.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from pyphysim_tpu.channels.fading import COST259_TUx, TdlChannel
from pyphysim_tpu.channels.fading_generators import JakesSampleGenerator
from pyphysim_tpu.reference_signals.channel_estimation import \
    CazacBasedChannelEstimator
from pyphysim_tpu.reference_signals.srs import get_srs_seq
from pyphysim_tpu.reference_signals.zadoffchu import (calcBaseZC,
                                                      get_extended_ZF)
from pyphysim_tpu.utils.conversion import linear2dB

import jax


def estimation_error_dB(H, Hest):
    return float(linear2dB(
        np.sum(np.abs(H - Hest) ** 2) / np.sum(np.abs(H) ** 2)))


def main():
    num_prbs = 25
    Nsc = 12 * num_prbs        # 300 subcarriers
    Nzc = 149
    num_an_ant = 4
    num_taps_to_keep = 15      # delay-domain truncation window

    fc = 2.6e9
    subcarrier_band = 15e3
    Ts = 1.0 / (Nsc * subcarrier_band)
    Fd = 0.0                   # static terminals, like the reference
    L = 16
    K = 3

    # root sequences and comb-2 SRS sequences (one ZC root per UE)
    shift_index = 4
    r = [get_srs_seq(get_extended_ZF(calcBaseZC(Nzc, u), Nsc // 2),
                     shift_index) for u in (1, 2, 3)]

    # channels UE -> AN: equivalent SISO after each UE's precoder. The
    # reference takes the dominant left singular vector of the 2x4
    # downlink block at one subcarrier as the UE precoder; the resulting
    # uplink equivalent channel is one column combination of the 4x2
    # uplink block. Frequency responses come from the TDL machinery.
    num_ue_ant = 2
    pl = np.array([[2.21e-08, 2.14e-09, 1.88e-08],
                   [3.45e-10, 2.17e-08, 4.53e-10],
                   [4.38e-10, 8.04e-10, 4.75e-08]])

    uH_eq = np.empty((K, K), dtype=object)  # [an, ue] -> (Nsc, num_an_ant)
    freq_resp = np.empty((K, K), dtype=object)
    for an in range(K):
        for ue in range(K):
            jakes = JakesSampleGenerator(Fd, Ts, L,
                                         shape=(num_ue_ant, num_an_ant))
            ch = TdlChannel(jakes, COST259_TUx)
            ch.generate_impulse_response(1)
            ir = ch.get_last_impulse_response()
            # framework convention: (UeAnt, AnAnt, num_samples, Nsc);
            # rearrange to (Nsc, UeAnt, AnAnt)
            h = ir.get_freq_response(Nsc)
            h = h.to_numpy() if hasattr(h, "to_numpy") else np.asarray(h)
            freq_resp[an, ue] = np.transpose(h[:, :, 0, :], (2, 0, 1))

    sc_idx = 124
    precoders = []
    for ue in range(K):
        u_mat, _, _ = np.linalg.svd(freq_resp[ue, ue][sc_idx])
        precoders.append(u_mat[:, 0].conj())

    for an in range(K):
        for ue in range(K):
            uplink = np.sqrt(pl[an, ue]) * np.transpose(
                freq_resp[an, ue], (0, 2, 1))      # (Nsc, AnAnt, UeAnt)
            uH_eq[an, ue] = uplink @ precoders[ue]  # (Nsc, AnAnt)

    # received comb-2 SRS at each AN: sum over UEs of eq-channel * seq
    comb = np.arange(0, Nsc, 2)
    Y = [sum(uH_eq[an, ue][comb] * r[ue][:, None] for ue in range(K))
         for an in range(K)]

    estimators = [CazacBasedChannelEstimator(r[ue]) for ue in range(K)]

    def estimate(Y_an):
        """Estimate all three equivalent channels from one AN's rx."""
        return [estimators[ue].estimate_channel_freq_domain(
            Y_an.T, num_taps_to_keep).T for ue in range(K)]

    def estimate_sic(Y_an, an):
        """Re-estimate cross channels after subtracting the direct one."""
        direct = estimators[an].estimate_channel_freq_domain(
            Y_an.T, num_taps_to_keep).T
        residual = Y_an - direct[comb] * r[an][:, None]
        out = []
        for ue in range(K):
            if ue == an:
                out.append(direct)
            else:
                out.append(estimators[ue].estimate_channel_freq_domain(
                    residual.T, num_taps_to_keep).T)
        return out

    print(f"Nsc: {Nsc}, comb-2 SRS, taps kept: {num_taps_to_keep}")
    print(f"{'link':>8} {'plain MSE dB':>13} {'SIC MSE dB':>11} "
          f"{'SIC gain dB':>12}")
    for an in range(K):
        plain = estimate(Y[an])
        sic = estimate_sic(Y[an], an)
        for ue in range(K):
            mse_plain = estimation_error_dB(uH_eq[an, ue], plain[ue])
            mse_sic = estimation_error_dB(uH_eq[an, ue], sic[ue])
            tag = "direct" if an == ue else "cross"
            print(f"UE{ue + 1}->AN{an + 1} {mse_plain:13.2f} "
                  f"{mse_sic:11.2f} {mse_plain - mse_sic:12.2f}  ({tag})")


if __name__ == "__main__":
    main()
