# %% [markdown]
# # OFDM transmission over a time-varying TDL channel
#
# The north-star chain: 16-QAM -> OFDM -> COST259 Typical Urban channel
# with Jakes Doppler -> one-tap equalization -> demodulation, as one
# jitted program. Shows the per-sample vs block-static channel modes and
# the frequency-domain transmission path.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.channels import (COST259_TUx, JakesSampleGenerator,
                                   TdlChannel)
from pyphysim_tpu.modulators import OFDM, QAM
from pyphysim_tpu.modulators.ofdm import OfdmOneTapEqualizer
from pyphysim_tpu.utils.misc import count_bit_errors, randn_c

bandwidth = 20e6
fft_size, cp_size, num_used = 512, 52, 300
Fd = 30.0  # Doppler (Hz)

qam = QAM(16)
ofdm = OFDM(fft_size, cp_size, num_used)
jakes = JakesSampleGenerator(Fd=Fd, Ts=1.0 / bandwidth, L=16)
channel = TdlChannel(jakes, COST259_TUx)
equalizer = OfdmOneTapEqualizer(ofdm)

print("channel:", channel.channel_profile)
print("discretized taps:", channel.num_taps,
      "span:", channel.num_taps_with_padding)

# %% One end-to-end transmission


def transmit(key, snr_db, block_static=True):
    k1, k2, k3 = jax.random.split(key, 3)
    n = num_used * 16
    data = jax.random.randint(k1, (n,), 0, 16)
    tx = ofdm.modulate(qam.modulate(data))
    state = channel.init_state(k2)
    block = ofdm.samples_per_symbol if block_static else None
    rx, ir, _ = channel.corrupt_data(state, tx, block_size=block)
    rx = rx + randn_c(k3, rx.shape[-1]) * jnp.sqrt(10 ** (-snr_db / 10))
    demod = ofdm.demodulate(rx[..., :tx.shape[-1]])
    eq = equalizer.equalize_data(demod, ir)
    decided = qam.demodulate_hard(eq)
    return count_bit_errors(data, decided), n * 4


# %% BER vs SNR (both channel modes agree)
for mode in (False, True):
    fn = jax.jit(lambda k, s: transmit(k, s, mode)[0])
    print(f"\nblock_static={mode}:")
    for snr in (5.0, 15.0, 25.0):
        errs = sum(int(fn(jax.random.PRNGKey(i), snr)) for i in range(8))
        print(f"  SNR {snr:5.1f} dB -> BER {errs / (num_used*16*4*8):.4f}")

# %% Frequency-domain (block static) transmission path — the reference's
# corrupt_data_in_freq_domain: one impulse response per OFDM block, no
# time-domain convolution at all.
state = channel.init_state(jax.random.PRNGKey(7))
sym = qam.modulate(jax.random.randint(jax.random.PRNGKey(8),
                                      (num_used * 4,), 0, 16))
carriers = ofdm.get_used_subcarrier_indexes()
out, ir, _ = channel.corrupt_data_in_freq_domain(state, sym, fft_size,
                                                 carriers)
print("\nfreq-domain output shape:", out.shape,
      "impulse responses:", ir.num_samples)
