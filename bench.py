"""Benchmark: simulated QAM symbols/s/chip through the PHY chain.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.md): the reference pyphysim sustains ~4.3e5 simulated
symbols/s on one CPU core through its simplest (AWGN) chain; the OFDM+TDL
chain is strictly slower. North star: >= 1e9 symbols/s/chip through
OFDM+TDL.

Runs on whatever backend jax selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SYMBOLS_PER_SEC = 4.3e5  # reference, 1 CPU core (BASELINE.md)


def bench_ofdm_tdl() -> float:
    """Symbols/s through 16-QAM -> OFDM -> TDL(Jakes) -> equalize ->
    demod -> BER count. Returns symbols/s."""
    import __graft_entry__ as g

    num_symbols = 300 * 64          # data symbols per realization
    batch = 64                      # realizations per step
    step = g._make_chain_step(num_symbols=num_symbols, fft_size=512,
                              cp_size=52, num_used=300)

    def mc(keys, snrs):
        return jnp.sum(jax.vmap(step)(keys, snrs))

    fn = jax.jit(mc)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    snrs = jnp.full((batch,), 15.0)
    fn(keys, snrs).block_until_ready()  # compile

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), batch)
        out = fn(keys, snrs)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    total_symbols = num_symbols * batch * n_iters
    return total_symbols / dt


def bench_awgn_fallback() -> float:
    """QPSK/AWGN chain fallback (pre-channels builds)."""
    import __graft_entry__ as g
    step, _ = g.entry()
    batch = 256

    def mc(keys, snrs):
        return jnp.sum(jax.vmap(step)(keys, snrs))

    fn = jax.jit(mc)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    snrs = jnp.full((batch,), 10.0)
    fn(keys, snrs).block_until_ready()
    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), batch)
        out = fn(keys, snrs)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return 4096 * batch * n_iters / dt


def main() -> None:
    try:
        value = bench_ofdm_tdl()
        metric = "simulated QAM symbols/s/chip (OFDM+TDL chain)"
    except ImportError:
        value = bench_awgn_fallback()
        metric = "simulated QAM symbols/s/chip (QPSK/AWGN chain; " \
                 "OFDM+TDL pending)"
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": "symbols/s",
        "vs_baseline": value / BASELINE_SYMBOLS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
