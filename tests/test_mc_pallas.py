"""Tests for the monolithic Monte-Carlo Pallas kernel (ops/mc_pallas.py).

Strategy: the kernel's randomness is injectable (``build_inject``), so on
the CPU interpreter we can (a) pin the full bit->error-count pipeline
against an independent complex-arithmetic model fed the SAME bits,
(b) pin the in-kernel channel math against the repo's (already
test-pinned) TdlChannel + FusedOfdmTdl path for identical Jakes phases,
and (c) check BER against the chain's empirical corner brackets with
honest Monte Carlo statistics. The TPU PRNG mode runs the identical
``_simulate_block`` math (only the bit source differs) and is asserted
on hardware by bench.py's BER corners.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyphysim_tpu.channels.fading import COST259_TUx, TdlChannel
from pyphysim_tpu.channels.fading_generators import (JakesSampleGenerator,
                                                     JakesState)
from pyphysim_tpu.modulators import OFDM
from pyphysim_tpu.ops.fused_ofdm_tdl import FusedOfdmTdl
from pyphysim_tpu.ops.mc_pallas import MonteCarloOfdmTdl, _u01

BANDWIDTH = 20e6
TS = 1.0 / BANDWIDTH


def _make_mc(tile=64, fft=512, cp=52, used=300, M=16):
    ofdm = OFDM(fft, cp, used)
    jakes = JakesSampleGenerator(Fd=30.0, Ts=TS, L=16)
    channel = TdlChannel(jakes, COST259_TUx)
    return MonteCarloOfdmTdl(ofdm, channel, M=M, tile=tile), ofdm, channel


def _draw_bits(key, mc, reps, num_tiles):
    tile, used_p, TLp = mc._tile, mc._used_p, mc._TLp
    ks = jax.random.split(key, 4)
    pb = jax.random.bits(ks[0], (reps, 8, TLp), jnp.uint32)
    shape = (reps, num_tiles * tile, used_p)
    db = jax.random.bits(ks[1], shape, jnp.uint32)
    n1 = jax.random.bits(ks[2], shape, jnp.uint32)
    n2 = jax.random.bits(ks[3], shape, jnp.uint32)
    return pb, db, n1, n2


def _model_counts(mc, pb, db, n1, n2, amp):
    """Independent complex-arithmetic model of one (rep, tile) grid cell,
    fed the same uint32 bits as the kernel."""
    tile, used, used_p = mc._tile, mc._used, mc._used_p
    M, Lq, half = mc._M, mc._Lq, mc._half_bits
    reps = pb.shape[0]
    num_tiles = db.shape[1] // tile
    G = np.asarray(mc._g_re) + 1j * np.asarray(mc._g_im)  # (TLp, used_p)
    out = np.zeros((reps, num_tiles), np.int64)
    for r in range(reps):
        phi = np.asarray(_u01(pb[r, 0:1, :])) * 2 * np.pi   # (1, TLp)
        psi = np.asarray(_u01(pb[r, 1:2, :])) * 2 * np.pi
        wl = mc._C * np.cos(phi)
        for s in range(num_tiles):
            t = (s * tile + np.arange(tile))[:, None].astype(np.float32)
            E = np.exp(1j * (t * wl + psi))                 # (tile, TLp)
            H = E @ G                                       # (tile, used_p)
            idx = np.asarray(db[r, s * tile:(s + 1) * tile]).astype(
                np.int64) & (M - 1)
            col = idx & (Lq - 1)
            row = idx >> half
            jj = col ^ (col >> 1)
            ii = row ^ (row >> 1)
            x = ((2 * jj - (Lq - 1)) +
                 1j * ((Lq - 1) - 2 * ii)) / mc._qam_scale
            from scipy.special import erfinv

            def u11(bits):
                return np.asarray(bits).astype(np.int32).astype(
                    np.float32) * np.float32(2.0 ** -31)

            z1 = np.clip(u11(n1[r, s * tile:(s + 1) * tile]),
                         -0.99999994, 0.99999994)
            z2 = np.clip(u11(n2[r, s * tile:(s + 1) * tile]),
                         -0.99999994, 0.99999994)
            noise = (erfinv(z1) + 1j * erfinv(z2)) * np.sqrt(2.0)
            y = x * H + amp * noise
            eq = y * np.conj(H) / (np.abs(H) ** 2 + 1e-30)
            col_pos = np.clip(np.floor(
                (eq.real * mc._qam_scale + (Lq - 1)) * 0.5 + 0.5),
                0, Lq - 1).astype(np.int64)
            row_pos = np.clip(np.floor(
                ((Lq - 1) - eq.imag * mc._qam_scale) * 0.5 + 0.5),
                0, Lq - 1).astype(np.int64)

            def inv_gray(p):
                o = p.copy()
                sh = 1
                while sh < 8:
                    o = o ^ (o >> sh)
                    sh *= 2
                return o

            decided = (inv_gray(row_pos) << half) | inv_gray(col_pos)
            diff = (idx ^ decided)[:, :used]
            out[r, s] = sum(int(((diff >> k) & 1).sum())
                            for k in range(mc._bits_per_symbol))
    return out


class TestInjectMatchesModel:
    def test_counts_match_independent_model(self):
        mc, _, _ = _make_mc(tile=64)
        reps, num_tiles = 2, 2
        pb, db, n1, n2 = _draw_bits(jax.random.PRNGKey(0), mc, reps,
                                    num_tiles)
        amp = np.float32(np.sqrt(0.5 / 10 ** 1.5) * mc.noise_gain)
        fn = mc.build_inject(reps, num_tiles)
        got = np.asarray(fn(pb, db, n1, n2, amp), np.int64)
        want = _model_counts(mc, pb, db, n1, n2, amp)
        # identical bits + identical f32 math; tolerate a handful of
        # decision-boundary flips from float association differences
        # between the complex model and the kernel's real-pair math
        total = int(want.sum())
        assert total > 1000  # the comparison is not vacuous
        assert abs(int(got.sum()) - total) <= 32
        assert np.all(np.abs(got - want) <= 16)

    def test_extreme_noise_bits_stay_finite(self):
        """Regression: 0x7fffffff noise bits cast-round to exactly 1.0 in
        _u11; without the upper-tail clamp erf_inv(1.0) = +inf corrupts
        every symbol decision in the tile. With the clamp the noise is a
        large-but-finite ~3.9-sigma sample: at high SNR (tiny amp) the
        decisions must come out nearly error-free, not saturated."""
        mc, _, _ = _make_mc(tile=64)
        pb, db, n1, n2 = _draw_bits(jax.random.PRNGKey(5), mc, 1, 1)
        n1 = jnp.full_like(n1, 0x7FFFFFFF)  # -> +1.0 before clamping
        n2 = jnp.full_like(n2, 0x7FFFFFFF)
        fn = mc.build_inject(1, 1)
        amp = np.float32(np.sqrt(0.5 / 10 ** 4.0) * mc.noise_gain)
        errs = int(np.asarray(fn(pb, db, n1, n2, amp)).sum())
        bits = mc._tile * mc._used * mc._bits_per_symbol
        assert errs < 0.01 * bits, (
            f"{errs}/{bits} bit errors — inf/NaN reached the slicer")

    def test_deterministic(self):
        mc, _, _ = _make_mc(tile=64)
        pb, db, n1, n2 = _draw_bits(jax.random.PRNGKey(3), mc, 1, 1)
        fn = mc.build_inject(1, 1)
        amp = np.float32(0.1)
        a = np.asarray(fn(pb, db, n1, n2, amp))
        b = np.asarray(fn(pb, db, n1, n2, amp))
        np.testing.assert_array_equal(a, b)


class TestChannelMathParity:
    def test_H_matches_tdl_strided_path(self):
        """The kernel's E @ G per-bin channel == the repo's
        TdlChannel strided impulse response pushed through the fused
        diag matrix, for identical Jakes phases."""
        mc, ofdm, channel = _make_mc(tile=16)
        gen = channel._fading_generator
        T = channel.channel_profile.num_taps
        Lr = gen.L
        nb = 16

        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        phi = jax.random.uniform(k1, (Lr, T, 1), minval=0.0,
                                 maxval=2 * np.pi)
        psi = jax.random.uniform(k2, (Lr, T, 1), minval=0.0,
                                 maxval=2 * np.pi)
        state = JakesState(phi_l=phi, psi_l=psi, t0=jnp.zeros(()))

        ir, _ = channel._generate_strided_impulse_response(
            state, nb, stride=ofdm.samples_per_symbol)
        taps = ir.tap_values_sparse                       # (T, nb)
        w = FusedOfdmTdl(ofdm, channel)._diag_matrix(jnp.float32)
        H_ref = (np.asarray(taps.re).T + 1j * np.asarray(taps.im).T) @ (
            np.asarray(w.re) + 1j * np.asarray(w.im))     # (nb, used)

        # kernel layout: il = tap * Lr + ray  <->  phi_l[ray, tap]
        phi_flat = np.asarray(phi[:, :, 0]).T.reshape(-1)  # (T*Lr,)
        psi_flat = np.asarray(psi[:, :, 0]).T.reshape(-1)
        G = np.asarray(mc._g_re) + 1j * np.asarray(mc._g_im)
        t = np.arange(nb)[:, None].astype(np.float64)
        E = np.exp(1j * (t * (mc._C * np.cos(phi_flat))[None, :] +
                         psi_flat[None, :]))               # (nb, T*Lr)
        H_kernel = E @ G[:mc._TL, :mc._used]
        np.testing.assert_allclose(H_kernel, H_ref, rtol=2e-4, atol=2e-4)


class TestBerStatistics:
    @pytest.mark.parametrize("snr_db,lo,hi", [
        (5.0, 0.08, 0.22),
        (15.0, 0.02, 0.06),
        (30.0, 2e-4, 6e-3),
    ])
    def test_ber_corners(self, snr_db, lo, hi):
        """Same empirical BER brackets the TPU bench asserts
        (bench.py BER_CORNERS) hold for the kernel math on CPU."""
        mc, _, _ = _make_mc(tile=64)
        reps, num_tiles = 4, 2
        pb, db, n1, n2 = _draw_bits(
            jax.random.fold_in(jax.random.PRNGKey(11), int(snr_db)),
            mc, reps, num_tiles)
        amp = np.float32(
            np.sqrt(0.5 / 10 ** (snr_db / 10.0)) * mc.noise_gain)
        fn = mc.build_inject(reps, num_tiles)
        counts = np.asarray(fn(pb, db, n1, n2, amp), np.int64)
        bits = reps * num_tiles * mc._tile * mc._used * mc._bits_per_symbol
        ber = counts.sum() / bits
        assert lo < ber < hi, f"BER {ber} outside ({lo}, {hi}) at {snr_db}"


class TestShardedKernel:
    """The flagship path's multi-chip mode (SURVEY §2.11 P2): the rep
    axis split over a Mesh with per-device absolute start offsets under
    shard_map. The absolute-index stream contract makes sharded and
    unsharded runs BIT-identical, which is exactly what these pin."""

    def test_inject_sharded_bit_identical(self):
        from pyphysim_tpu.parallel import make_mesh
        mc, _, _ = _make_mc(tile=16)
        reps, nt = 8, 2
        pb, db, n1, n2 = _draw_bits(jax.random.PRNGKey(0), mc, reps, nt)
        amp = np.float32(0.1)
        one = np.asarray(mc.build_inject(reps, nt)(pb, db, n1, n2, amp))
        for ndev in (2, 8):
            mesh = make_mesh(ndev)
            got = np.asarray(
                mc.build_inject(reps, nt, mesh=mesh)(pb, db, n1, n2, amp))
            np.testing.assert_array_equal(got, one)

    def test_reps_must_divide(self):
        from pyphysim_tpu.parallel import make_mesh
        mc, _, _ = _make_mc(tile=16)
        with pytest.raises(ValueError, match="divisible"):
            mc.build_inject(6, 2, mesh=make_mesh(4))
        with pytest.raises(ValueError, match="divisible"):
            mc.build(6, 2, mesh=make_mesh(4))


class TestTpuMode:
    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="in-kernel PRNG requires real TPU")
    def test_tpu_prng_mode_runs(self):  # pragma: no cover - TPU only
        mc, _, _ = _make_mc(tile=64)
        fn = mc.build(2, 2)
        out = np.asarray(fn(jnp.int32(1), jnp.float32(10 ** 1.5)))
        bits = 2 * 2 * mc._tile * mc._used * mc._bits_per_symbol
        assert 0.02 < out.sum() / bits < 0.06


class TestRunnerIntegration:
    """The bulk-kernel runner path (SimulationRunner._gen_bulk_kernel)
    driving the MC kernel in inject mode — the CPU-testable version of
    apps/ofdm/ofdm_mc_kernel.py's TPU flow."""

    class McRunner(__import__("pyphysim_tpu.simulations",
                              fromlist=["SimulationRunner"]
                              ).SimulationRunner):
        def __init__(self, batch_size=4):
            super().__init__(read_command_line_args=False)
            from pyphysim_tpu.channels.fading import (TdlChannel,
                                                      TdlChannelProfile)
            from pyphysim_tpu.simulations import Result

            self.params.add("SNR", np.array([5.0, 15.0]))
            self.params.set_unpack_parameter("SNR")
            self.rep_max = 6
            self.batch_size = batch_size
            self.update_progress_function_style = None
            self.batch_result_types = {"bit_errors": Result.SUMTYPE,
                                       "ber": Result.RATIOTYPE}
            self.num_tiles = 2
            profile = TdlChannelProfile(np.array([0.0, -3.0]),
                                        np.array([0.0, 100e-9]), "tiny")
            ofdm = OFDM(64, 8, 32)
            jakes = JakesSampleGenerator(Fd=30.0, Ts=TS, L=4)
            channel = TdlChannel(jakes, profile)
            self.mc = MonteCarloOfdmTdl(ofdm, channel, M=16, tile=16)
            self._fns = {}

        def _gen_bulk_kernel(self, current_parameters):
            from pyphysim_tpu.utils.conversion import dB2Linear
            mc, nt = self.mc, self.num_tiles
            snr = dB2Linear(float(current_parameters["SNR"]))
            amp = np.float32(np.sqrt(0.5 / snr) * mc.noise_gain)
            base = jax.random.fold_in(
                jax.random.PRNGKey(self.base_seed),
                max(current_parameters.unpack_index, 0))
            bits_per_rep = nt * mc._tile * mc._used * 4
            mesh = self.mesh

            def draw(key, salt, shape):
                return jax.random.bits(jax.random.fold_in(key, salt),
                                       shape, jnp.uint32)

            def bulk(start, n):
                if (n, mesh) not in self._fns:
                    self._fns[n, mesh] = mc.build_inject(n, nt, mesh=mesh)
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(base, i))(
                        jnp.arange(start, start + n))
                shape = (nt * mc._tile, mc._used_p)
                pb = jax.vmap(lambda k: draw(k, 0, (8, mc._TLp)))(keys)
                db = jax.vmap(lambda k: draw(k, 1, shape))(keys)
                n1 = jax.vmap(lambda k: draw(k, 2, shape))(keys)
                n2 = jax.vmap(lambda k: draw(k, 3, shape))(keys)
                counts = np.asarray(
                    self._fns[n, mesh](pb, db, n1, n2, amp)).sum(axis=1)
                return {"bit_errors": counts,
                        "ber": (counts.astype(float),
                                np.full(n, float(bits_per_rep)))}

            return bulk

    def test_runner_drives_kernel(self):
        r = self.McRunner()
        r.simulate()
        assert r.runned_reps == [6, 6]
        ber5, ber15 = r.results.get_result_values_list("ber")
        assert 0.0 < ber15 < ber5 < 0.5

    def test_chunk_size_invariant(self):
        a = self.McRunner(batch_size=2)
        b = self.McRunner(batch_size=6)
        a.simulate()
        b.simulate()
        assert np.allclose(a.results.get_result_values_list("ber"),
                           b.results.get_result_values_list("ber"))
        assert a.results["bit_errors"][0].get_result() == \
            b.results["bit_errors"][0].get_result()

    @pytest.mark.parametrize("ndev", [2, 8])
    def test_mesh_sharded_runner_identical(self, ndev):
        """The VERDICT round-2 directive: bulk-path runner results must
        be bit-identical on 1 vs N virtual devices. simulate_in_parallel
        shards each chunk's rep axis over the mesh; the absolute-index
        stream contract plus chunk-size invariance make the Results
        equal EXACTLY, not just statistically."""
        from pyphysim_tpu.parallel import make_mesh
        a = self.McRunner(batch_size=4)
        a.simulate()
        b = self.McRunner(batch_size=4)
        b.simulate_in_parallel(make_mesh(ndev))
        assert b.runned_reps == a.runned_reps
        for name in ("bit_errors", "ber"):
            av = a.results.get_result_values_list(name)
            bv = b.results.get_result_values_list(name)
            np.testing.assert_array_equal(np.asarray(av), np.asarray(bv))
