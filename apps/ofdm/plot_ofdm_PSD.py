#!/usr/bin/env python
"""Plot the power spectral density of OFDM modulated data.

Counterpart of the reference's ``apps/ofdm/plot_ofdm_PSD.py``: BPSK bits
through an 802.11a-style OFDM(64, CP 16, 52 used subcarriers), Welch PSD of
the time-domain signal. The OFDM transform runs on device (matmul-DFT);
only the PSD/plot is host-side.

Run:  python apps/ofdm/plot_ofdm_PSD.py [--out ofdm_psd.png]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from pyphysim_tpu.modulators.ofdm import OFDM


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="ofdm_psd.png")
    args = parser.parse_args()

    rng = np.random.RandomState(0)
    num_bits = 2496  # multiple of 52 used subcarriers
    ip_bits = rng.randint(0, 2, num_bits)
    ip_mod = (2 * ip_bits - 1).astype(complex)  # BPSK: 0 -> -1, 1 -> +1

    ofdm_obj = OFDM(64, 16, 52)
    ofdm_symbols = np.asarray(ofdm_obj.modulate(ip_mod))

    fs_mhz = 20e6
    try:
        from matplotlib import mlab
        from matplotlib import pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing total signal power instead")
        print("mean |x|^2 =", float(np.mean(np.abs(ofdm_symbols) ** 2)))
        return

    pxx, freqs = mlab.psd(ofdm_symbols, NFFT=ofdm_obj.fft_size, Fs=fs_mhz)
    plt.plot(freqs, 10 * np.log10(pxx))
    plt.xlabel("frequency, MHz")
    plt.ylabel("power spectral density")
    plt.title("Transmit spectrum OFDM (based on 802.11a)")
    plt.savefig(args.out, dpi=120)
    print(f"Saved PSD plot to {args.out}")


if __name__ == "__main__":
    main()
