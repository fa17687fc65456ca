"""Benchmark: simulated QAM symbols/s/chip through the OFDM+TDL chain.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Chain: 16-QAM -> OFDM(512, cp 52, 300 used) -> COST259-TU TDL with Jakes
Doppler (block-static per OFDM symbol) -> AWGN -> one-tap equalization ->
hard demodulation -> BER count. Monte Carlo realizations vmapped into one
jitted program. Runs the fused OFDM-over-TDL path
(ops/fused_ofdm_tdl.py): the CP both absorbs the convolution tail and is
discarded, so TX and RX each collapse to ONE matmul and the AWGN is
injected post-demodulation with the exactly equivalent variance — tests
pin the fused path's outputs to the time-domain chain's.

Measurement notes:
  * dispatch many steps and fetch ONE reduced scalar at the end — on the
    remote-attached TPU, per-step host syncs dominate otherwise and
    ``block_until_ready`` alone under-reports,
  * the error count is summed over all steps and sanity-checked against
    the expected BER so the compiler cannot elide work.

Baseline (BASELINE.md): reference pyphysim sustains ~4.3e5 simulated
symbols/s on one CPU core (its OFDM+TDL chain is strictly slower).
North star: >= 1e9 symbols/s/chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SYMBOLS_PER_SEC = 4.3e5  # reference, 1 CPU core (BASELINE.md)


def bench_ofdm_tdl() -> float:
    import pyphysim_tpu.ops.fft as cfft
    cfft.FOUR_STEP_MIN = 10_000  # direct DFT matmul beats 4-step here
    import pyphysim_tpu.channels.fading as fading
    fading.BLOCK_CONV_IMPL = "fft"  # MXU freq-domain conv: 2.19 vs 1.78
    import __graft_entry__ as g

    # batch x num_symbols tuned on v5e for the fused path: 512 x 4800
    # (10.7 Gsym/s with the diag collapse; 1024 x 4800 measures the same,
    # 128 x 19200 was the time-domain optimum). iters amortizes the
    # relay's fixed ~24 ms dispatch+fetch latency — at ~0.23 ms/step,
    # 2500 iters keeps it under 5%.
    batch = 512
    num_symbols = 300 * 16
    snr_db = 15.0
    step = g._make_chain_step(num_symbols=num_symbols, fft_size=512,
                              cp_size=52, num_used=300, block_static=True,
                              precision=jax.lax.Precision.DEFAULT,
                              signal_dtype=jnp.bfloat16, fused=True)

    snrs = jnp.full((batch,), 10 ** (snr_db / 10.0))
    iters = 2500

    @jax.jit
    def run_many(base_key):
        def body(carry, i):
            keys = jax.random.split(jax.random.fold_in(base_key, i), batch)
            return carry + jnp.sum(jax.vmap(step)(keys, snrs)), 0

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                jnp.arange(iters))
        return total

    # rbg keys use the TPU hardware RNG (faster than threefry here)
    def make_key(seed):
        try:
            return jax.random.key(seed, impl="rbg")
        except TypeError:  # older jax
            return jax.random.PRNGKey(seed)

    # compile + warm up (forces one real round trip)
    int(run_many(make_key(0)))

    t0 = time.perf_counter()
    total_errors = int(run_many(make_key(1)))
    dt = time.perf_counter() - t0

    # sanity: BER at 15 dB for this chain is ~0.037; a wildly different
    # value means the chain was broken or elided
    ber = total_errors / (batch * num_symbols * 4 * iters)
    assert 0.02 < ber < 0.06, f"implausible BER {ber}"

    return batch * num_symbols * iters / dt


def main() -> None:
    value = bench_ofdm_tdl()
    print(json.dumps({
        "metric": "simulated QAM symbols/s/chip (OFDM+TDL chain)",
        "value": value,
        "unit": "symbols/s",
        "vs_baseline": value / BASELINE_SYMBOLS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
