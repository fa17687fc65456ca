# %% [markdown]
# # Alamouti diversity and interference alignment
#
# Counterpart of the reference's `Alamouti.ipynb`: Alamouti 2x1 vs MRC
# 1x2 over Rayleigh fading, then a 3-user IA sum-capacity sweep run
# entirely on-device with the batched Max-SINR kernel.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.mimo import MRC, Alamouti
from pyphysim_tpu.modulators import QPSK
from pyphysim_tpu.ops import cplx
from pyphysim_tpu.ops.cplx import CArray
from pyphysim_tpu.utils.misc import count_bit_errors, randn_c

qpsk = QPSK()
n = 200

# %% Alamouti vs MRC BER


def alamouti_rep(key, snr):
    k1, k2, k3 = jax.random.split(key, 3)
    data = jax.random.randint(k1, (n,), 0, 4)
    h = randn_c(k2, 1, 2)
    al = Alamouti(h)
    rx = cplx.matmul(h, al.encode(qpsk.modulate(data))) + \
        randn_c(k3, 1, n) * jnp.sqrt(1 / snr)
    return count_bit_errors(data, qpsk.demodulate(al.decode(rx)))


def mrc_rep(key, snr):
    k1, k2, k3 = jax.random.split(key, 3)
    data = jax.random.randint(k1, (n,), 0, 4)
    h = randn_c(k2, 2)
    tx = qpsk.modulate(data)
    rx = CArray(h.re[:, None] * tx.re - h.im[:, None] * tx.im,
                h.re[:, None] * tx.im + h.im[:, None] * tx.re) + \
        randn_c(k3, 2, n) * jnp.sqrt(1 / snr)
    return count_bit_errors(data, qpsk.demodulate(MRC(h).decode(rx)))


keys = jax.random.split(jax.random.PRNGKey(0), 400)
for name, rep in [("Alamouti 2x1", alamouti_rep), ("MRC 1x2", mrc_rep)]:
    print(f"\n{name}:")
    for snr_db in (5.0, 10.0, 15.0, 20.0):
        snr = 10 ** (snr_db / 10)
        errs = int(jnp.sum(jax.vmap(lambda k: rep(k, snr))(keys)))
        print(f"  SNR {snr_db:5.1f} dB -> BER {errs / (400 * n * 2):.5f}")

# %% 3-user IA sum-capacity sweep, fully on-device
from pyphysim_tpu.ia.batched import (calc_sinrs, max_sinr_solve,
                                     sum_capacity)


@jax.jit
def ia_sweep(key):
    def per_snr(snr_db):
        nv = 10 ** (-snr_db / 10.0)

        def one(k):
            k1, k2 = jax.random.split(k)
            H = randn_c(k1, 3, 3, 2, 2)
            F, U = max_sinr_solve(H, k2, Ns=1, P=1.0, noise_var=nv,
                                  iterations=25)
            return sum_capacity(calc_sinrs(H, F, U, nv, 1.0))

        return jnp.mean(jax.vmap(one)(jax.random.split(key, 32)))

    return jax.vmap(per_snr)(jnp.array([0.0, 10.0, 20.0, 30.0]))


caps = np.asarray(ia_sweep(jax.random.PRNGKey(1)))
print("\n3-user IA mean sum capacity (bits) at 0/10/20/30 dB:")
print("  " + "  ".join(f"{c:6.2f}" for c in caps))

# %% [markdown]
# ## Solver comparison: Max-SINR vs Min-Leakage vs MMSE
#
# All three iterative IA algorithms run on-device with fixed iteration
# counts. The physics to expect: Min-Leakage ignores noise, so it loses
# at low SNR and catches up at high SNR; MMSE tracks Max-SINR closely.

# %%
from pyphysim_tpu.ia.batched import min_leakage_solve, mmse_solve


@jax.jit
def solver_sweep(key):
    def per_snr(snr_db):
        nv = 10 ** (-snr_db / 10.0)

        def one(k):
            k1, k2 = jax.random.split(k)
            H = randn_c(k1, 3, 3, 2, 2)
            Fm, Um = max_sinr_solve(H, k2, Ns=1, P=1.0, noise_var=nv,
                                    iterations=25)
            Fl, Ul = min_leakage_solve(H, k2, Ns=1, iterations=25)
            Fe, Ue = mmse_solve(H, k2, Ns=1, P=1.0, noise_var=nv,
                                iterations=25)
            nrm = jnp.sqrt(jnp.sum(Fe.abs2(), axis=(-2, -1),
                                   keepdims=True))
            Fen = CArray(Fe.re / nrm, Fe.im / nrm)
            return jnp.stack([
                sum_capacity(calc_sinrs(H, F, U, nv, 1.0))
                for F, U in ((Fm, Um), (Fl, Ul), (Fen, Ue))])

        return jnp.mean(jax.vmap(one)(jax.random.split(key, 32)), axis=0)

    return jax.vmap(per_snr)(jnp.array([0.0, 10.0, 20.0, 30.0]))


caps3 = np.asarray(solver_sweep(jax.random.PRNGKey(2)))
print("\nmean sum capacity (bits) [max-sinr, min-leakage, mmse]:")
for snr, row in zip((0, 10, 20, 30), caps3):
    print(f"  SNR {snr:2d} dB: " + "  ".join(f"{c:6.2f}" for c in row))
