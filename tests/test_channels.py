"""Tests for pyphysim_tpu.channels — generators, profiles, TDL channels,
path loss, noise, antenna gains (mirrors the reference's
tests/channels_package_test.py coverage, SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyphysim_tpu.channels import (COST259_RAx, COST259_TUx,
                                   JakesSampleGenerator,
                                   RayleighSampleGenerator, TdlChannel,
                                   TdlChannelProfile, TdlImpulseResponse,
                                   TdlMimoChannel)
from pyphysim_tpu.channels import antennagain, noise, pathloss
from pyphysim_tpu.channels.fading_generators import generate_jakes_samples
from pyphysim_tpu.ops import cplx
from pyphysim_tpu.utils.misc import randn_c


class TestRayleighGenerator:
    def test_shapes_and_stats(self):
        gen = RayleighSampleGenerator(shape=(3, 2))
        state = gen.init_state(jax.random.PRNGKey(0))
        s, state2 = gen.generate(state, 1000)
        assert s.shape == (3, 2, 1000)
        x = s.to_numpy()
        assert np.isclose(np.mean(np.abs(x) ** 2), 1.0, atol=0.05)
        # successive calls give different samples
        s2, _ = gen.generate(state2, 1000)
        assert not np.allclose(x, s2.to_numpy())

    def test_skip_changes_stream(self):
        gen = RayleighSampleGenerator()
        st = gen.init_state(jax.random.PRNGKey(1))
        s1, _ = gen.generate(gen.skip(st, 5), 4)
        s2, _ = gen.generate(st, 4)
        assert not np.allclose(s1.to_numpy(), s2.to_numpy())

    def test_stateful_reference_api(self):
        # fading_generators.py:156-205 stateful host API
        gen = RayleighSampleGenerator(shape=(3, 2))
        gen.set_seed(7)
        assert gen.get_samples() is None
        gen.generate_more_samples()          # num_samples=None: no axis
        assert gen.get_samples().shape == (3, 2)
        assert np.iscomplexobj(gen.get_samples())
        gen.generate_more_samples(50)
        a = gen.get_samples()
        assert a.shape == (3, 2, 50)
        gen.generate_more_samples(50)
        assert not np.allclose(a, gen.get_samples())
        # skip is statistically a no-op but must not fail
        gen.skip_samples_for_next_generation(10)
        gen.generate_more_samples(5)
        assert gen.get_samples().shape == (3, 2, 5)


class TestJakesGenerator:
    def test_statistics(self):
        gen = JakesSampleGenerator(Fd=100, Ts=1e-3, L=32)
        state = gen.init_state(jax.random.PRNGKey(0))
        s, _ = gen.generate(state, 5000)
        x = s.to_numpy()
        # unit average power
        assert np.isclose(np.mean(np.abs(x) ** 2), 1.0, atol=0.15)

    def test_continuity_across_calls(self):
        # generating 10 then 15 samples == generating 25 at once
        gen = JakesSampleGenerator(Fd=50, Ts=1e-3, L=8)
        st0 = gen.init_state(jax.random.PRNGKey(2))
        a, st1 = gen.generate(st0, 10)
        b, _ = gen.generate(st1, 15)
        full, _ = gen.generate(st0, 25)
        combined = np.concatenate([a.to_numpy(), b.to_numpy()], axis=-1)
        assert np.allclose(combined, full.to_numpy(), atol=1e-4)

    def test_skip_equals_generate_and_discard(self):
        gen = JakesSampleGenerator(Fd=50, Ts=1e-3, L=8)
        st0 = gen.init_state(jax.random.PRNGKey(3))
        _, st_a = gen.generate(st0, 10)
        st_b = gen.skip(st0, 10)
        sa, _ = gen.generate(st_a, 5)
        sb, _ = gen.generate(st_b, 5)
        assert np.allclose(sa.to_numpy(), sb.to_numpy(), atol=1e-4)

    def test_stateful_api_matches_functional(self):
        # stateful generate_more_samples(10)+(15) == functional generate(25)
        gen = JakesSampleGenerator(Fd=50, Ts=1e-3, L=8, shape=2)
        gen.set_seed(11)
        gen.generate_more_samples(10)
        a = gen.get_samples()
        gen.generate_more_samples(15)
        b = gen.get_samples()
        full, _ = gen.generate(gen.init_state(jax.random.PRNGKey(11)), 25)
        assert np.allclose(np.concatenate([a, b], axis=-1),
                           full.to_numpy(), atol=1e-4)

    def test_stateful_skip_advances_clock(self):
        gen = JakesSampleGenerator(Fd=50, Ts=1e-3, L=8)
        gen.set_seed(12)
        gen.skip_samples_for_next_generation(10)
        gen.generate_more_samples(5)
        skipped = gen.get_samples()
        st = gen.init_state(jax.random.PRNGKey(12))
        _, st2 = gen.generate(st, 10)
        expect, _ = gen.generate(st2, 5)
        assert np.allclose(skipped, expect.to_numpy(), atol=1e-4)

    def test_temporal_correlation(self):
        # Jakes autocorrelation ~ J0(2 pi Fd tau): high at small lag
        gen = JakesSampleGenerator(Fd=100, Ts=1e-4, L=64)
        # average correlation over independent realizations
        keys = jax.random.split(jax.random.PRNGKey(4), 400)

        def one(key):
            s, _ = gen.generate(gen.init_state(key), 200)
            return s

        s = jax.vmap(one)(keys).to_numpy()  # (400, 200)
        power = np.mean(np.abs(s) ** 2)
        # normalized correlation at lag Ts: J0(2 pi Fd Ts) = J0(0.063) ~ 1
        corr = np.mean(s[:, :-1] * np.conj(s[:, 1:])) / power
        assert corr.real > 0.95
        # lag of 100 samples: J0(2 pi * 100 * 0.01) = J0(6.28) ~ 0.22
        import scipy.special
        far = np.mean(s[:, :100] * np.conj(s[:, 100:])) / power
        expected = scipy.special.j0(2 * np.pi * 100 * 100 * 1e-4)
        assert abs(far.real - expected) < 0.1

    def test_free_function(self):
        s = generate_jakes_samples(Fd=20, Ts=1e-3, num_samples=10, L=8,
                                   shape=(2,), key=jax.random.PRNGKey(0))
        assert s.shape == (2, 10)


class TestTdlChannelProfile:
    def test_basic_properties(self):
        assert COST259_TUx.num_taps == 20
        assert np.isclose(COST259_TUx.rms_delay_spread, 0.5e-6, rtol=0.1)
        assert COST259_TUx.mean_excess_delay > 0
        assert not COST259_TUx.is_discretized

    def test_discretization(self):
        Ts = 3.25e-8
        disc = COST259_TUx.get_discretize_profile(Ts)
        assert disc.is_discretized
        assert disc.Ts == Ts
        # reference documents 15 non-zero taps inside a 67-tap span for
        # COST259 TU at this Ts (fading.py docstring)
        assert disc.num_taps == 15
        assert disc.num_taps_with_padding == 67
        # power normalized to 1
        assert np.isclose(disc.tap_powers_linear.sum(), 1.0)
        with pytest.raises(RuntimeError):
            disc.get_discretize_profile(Ts)

    def test_default_profile(self):
        p = TdlChannelProfile()
        assert p.num_taps == 1
        assert p.tap_delays[0] == 0


class TestTdlChannel:
    def test_siso_corrupt_data_matches_manual_conv(self):
        # Rayleigh flat channel with 3 taps at known delays
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, tap_powers_dB=np.array([0., -3., -6.]),
                        tap_delays=np.array([0., 2., 3.]), Ts=1.0)
        assert ch.num_taps == 3
        assert ch.num_taps_with_padding == 4
        state = ch.init_state(jax.random.PRNGKey(0))
        x = randn_c(jax.random.PRNGKey(1), 50)
        out, ir, _ = ch.corrupt_data(state, x)
        assert out.shape == (50 + 3,)
        # manual sparse convolution using the generated taps
        taps = ir.tap_values_sparse.to_numpy()  # (3, 50)
        xs = x.to_numpy()
        expected = np.zeros(53, complex)
        for i, d in enumerate([0, 2, 3]):
            expected[d:d + 50] += taps[i] * xs
        assert np.allclose(out.to_numpy(), expected, atol=1e-4)

    def test_impulse_response_power_profile(self):
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, channel_profile=COST259_TUx, Ts=3.25e-8)
        state = ch.init_state(jax.random.PRNGKey(0))
        ir, _ = ch.generate_impulse_response_f(state, 2000)
        p = np.mean(np.abs(ir.tap_values_sparse.to_numpy()) ** 2, axis=-1)
        assert np.allclose(p, ch.channel_profile.tap_powers_linear,
                           rtol=0.25)

    def test_dense_tap_values(self):
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, tap_powers_dB=np.array([0., -3.]),
                        tap_delays=np.array([0., 2.]), Ts=1.0)
        ir, _ = ch.generate_impulse_response_f(
            ch.init_state(jax.random.PRNGKey(0)), 5)
        dense = ir.tap_values.to_numpy()
        assert dense.shape == (3, 5)
        assert np.allclose(dense[1], 0)

    def test_tap_delays_sparse(self):
        # fading.py:430-440: delays in seconds = indexes * Ts
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, tap_powers_dB=np.array([0., -3.]),
                        tap_delays=np.array([0., 2e-6]), Ts=1e-6)
        ir, _ = ch.generate_impulse_response_f(
            ch.init_state(jax.random.PRNGKey(0)), 2)
        assert np.allclose(ir.tap_delays_sparse, [0.0, 2e-6])

    def test_freq_response_matches_fft(self):
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, channel_profile=COST259_TUx, Ts=3.25e-8)
        ir, _ = ch.generate_impulse_response_f(
            ch.init_state(jax.random.PRNGKey(0)), 3)
        fr = ir.get_freq_response(64).to_numpy()  # (3, 64)
        dense = ir.tap_values.to_numpy()  # (67, 3)
        expected = np.fft.fft(dense, 64, axis=0).T
        assert np.allclose(fr, expected, atol=1e-3)

    def test_mimo_corrupt_data(self):
        gen = RayleighSampleGenerator(shape=(2, 3))  # Nr=2, Nt=3
        ch = TdlMimoChannel(gen, tap_powers_dB=np.array([0., -3.]),
                            tap_delays=np.array([0., 1.]), Ts=1.0)
        state = ch.init_state(jax.random.PRNGKey(0))
        x = randn_c(jax.random.PRNGKey(1), 3, 20)
        out, ir, _ = ch.corrupt_data(state, x)
        assert out.shape == (2, 21)
        taps = ir.tap_values_sparse.to_numpy()  # (2, 2, 3, 20)
        xs = x.to_numpy()
        expected = np.zeros((2, 21), complex)
        for i, d in enumerate([0, 1]):
            for t in range(3):
                expected[:, d:d + 20] += taps[i, :, t, :] * xs[t]
        assert np.allclose(out.to_numpy(), expected, atol=1e-4)

    def test_mimo_switched_direction(self):
        gen = RayleighSampleGenerator(shape=(2, 3))
        ch = TdlMimoChannel(gen, tap_powers_dB=np.array([0.]),
                            tap_delays=np.array([0.]), Ts=1.0)
        ch.switched_direction = True
        state = ch.init_state(jax.random.PRNGKey(0))
        x = randn_c(jax.random.PRNGKey(1), 2, 10)  # per-rx (uplink)
        out, ir, _ = ch.corrupt_data(state, x)
        assert out.shape == (3, 10)
        H = ir.tap_values_sparse.to_numpy()[0]  # (2, 3, 10)
        xs = x.to_numpy()
        expected = np.einsum("rtm,rm->tm", H, xs)
        assert np.allclose(out.to_numpy(), expected, atol=1e-4)

    def test_freq_domain_block_static(self):
        fft_size = 16
        gen = JakesSampleGenerator(Fd=10, Ts=1e-6, L=8)
        ch = TdlChannel(gen, tap_powers_dB=np.array([0., -3.]),
                        tap_delays=np.array([0., 3e-6]))
        state = ch.init_state(jax.random.PRNGKey(0))
        x = randn_c(jax.random.PRNGKey(1), fft_size * 3)
        out, ir, _ = ch.corrupt_data_in_freq_domain(state, x, fft_size)
        assert out.shape == (fft_size * 3,)
        assert ir.num_samples == 3  # one response per block
        # each block multiplied by its own frequency response
        fr = ir.get_freq_response(fft_size).to_numpy()  # (3, 16)
        xs = x.to_numpy().reshape(3, 16)
        expected = (xs * fr).ravel()
        assert np.allclose(out.to_numpy(), expected, atol=1e-3)

    def test_freq_domain_with_carrier_indexes(self):
        fft_size = 16
        carriers = np.array([1, 2, 3, 4, 12, 13, 14, 15])
        gen = JakesSampleGenerator(Fd=10, Ts=1e-6, L=8)
        ch = TdlChannel(gen, tap_powers_dB=np.array([0.]),
                        tap_delays=np.array([0.]))
        state = ch.init_state(jax.random.PRNGKey(0))
        x = randn_c(jax.random.PRNGKey(1), 8 * 2)
        out, ir, _ = ch.corrupt_data_in_freq_domain(state, x, fft_size,
                                                    carriers)
        fr = ir.get_freq_response(fft_size).to_numpy()[:, carriers]
        xs = x.to_numpy().reshape(2, 8)
        assert np.allclose(out.to_numpy(), (xs * fr).ravel(), atol=1e-3)

    def test_freq_domain_block_static_evolution_matches_skip(self):
        # the strided generation must equal generate+skip semantics
        fft_size = 8
        gen = JakesSampleGenerator(Fd=100, Ts=1e-5, L=8)
        ch = TdlChannel(gen, tap_powers_dB=np.array([0.]),
                        tap_delays=np.array([0.]))
        st = ch.init_state(jax.random.PRNGKey(5))
        x = randn_c(jax.random.PRNGKey(6), fft_size * 4)
        _, ir, _ = ch.corrupt_data_in_freq_domain(st, x, fft_size)
        # manual: generate 1 sample, skip fft_size-1, repeat
        vals = []
        s = st
        for _ in range(4):
            one, s = gen.generate(s, 1)
            vals.append(one.to_numpy()[..., 0])
            s = gen.skip(s, fft_size - 1)
        manual = np.stack(vals, axis=-1)
        assert np.allclose(ir.tap_values_sparse.to_numpy(), manual,
                           atol=1e-4)

    def test_stateful_convenience(self):
        gen = RayleighSampleGenerator()
        ch = TdlChannel(gen, tap_powers_dB=np.array([0.]),
                        tap_delays=np.array([0.]), Ts=1.0)
        ch.seed(42)
        x = randn_c(jax.random.PRNGKey(1), 10)
        out = ch.corrupt_data(x)
        assert out.shape == (10,)
        assert ch.get_last_impulse_response() is not None
        # same seed reproduces
        ch.seed(42)
        out2 = ch.corrupt_data(x)
        assert np.allclose(out.to_numpy(), out2.to_numpy())

    def test_ts_mismatch_raises(self):
        gen = JakesSampleGenerator(Ts=1e-6)
        with pytest.raises(RuntimeError):
            TdlChannel(gen, channel_profile=COST259_TUx, Ts=2e-6)

    def test_jit_vmap_chain(self):
        # the whole corrupt_data chain must vmap and jit
        gen = JakesSampleGenerator(Fd=30, Ts=3.25e-8, L=8)
        ch = TdlChannel(gen, channel_profile=COST259_TUx)

        @jax.jit
        def run(keys, x):
            def one(key):
                st = ch.init_state(key)
                out, _, _ = ch.corrupt_data(st, x)
                return out

            return jax.vmap(one)(keys)

        x = randn_c(jax.random.PRNGKey(0), 128)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        out = run(keys, x)
        assert out.shape == (4, 128 + 66)
        assert not np.allclose(out.to_numpy()[0], out.to_numpy()[1])


class TestPathLoss:
    def test_type_property_and_latex(self):
        # pathloss.py:93-96 / 1081-1121
        assert pathloss.PathLossFreeSpace().type == "outdoor"
        assert pathloss.PathLossMetisPS7().type == "indoor"
        latex = pathloss.PathLossMetisPS7.get_latex_repr(None)
        assert "A" in latex and latex.startswith("$")
        los = pathloss.PathLossMetisPS7.get_latex_repr(0)
        assert "18.7" in los and "+ 0" in los
        nlos = pathloss.PathLossMetisPS7.get_latex_repr(3)
        assert "36.8" in nlos and "+ 10" in nlos
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pathloss.PathLossMetisPS7.get_latex_repr(-1)

    def test_general(self):
        pl = pathloss.PathLossGeneral(n=3.7, C=120)
        assert np.isclose(pl.calc_path_loss_dB(1.0), 120.0)
        assert np.isclose(pl.calc_path_loss_dB(10.0), 157.0)
        assert np.isclose(pl.which_distance_dB(157.0), 10.0)

    def test_free_space(self):
        pl = pathloss.PathLossFreeSpace(n=2.0, fc=900.0)
        # classic: 91.5 dB at 1 km, 900 MHz
        assert np.isclose(pl.calc_path_loss_dB(1.0), 91.53, atol=0.05)
        # inverse
        d = pl.which_distance(pl.calc_path_loss(0.5))
        assert np.isclose(d, 0.5)
        # fc setter updates C
        pl.fc = 1800.0
        assert np.isclose(pl.calc_path_loss_dB(1.0), 97.55, atol=0.1)

    def test_3gpp1(self):
        pl = pathloss.PathLoss3GPP1()
        assert np.isclose(pl.calc_path_loss_dB(1.0), 128.1)
        assert np.isclose(pl.calc_path_loss_dB(0.5),
                          128.1 + 37.6 * np.log10(0.5))

    def test_metis_ps7(self):
        pl = pathloss.PathLossMetisPS7(fc=5000.0)  # 5 GHz -> C term = 0
        los = pl.calc_path_loss_dB(10.0, num_walls=0)
        assert np.isclose(los, 18.7 * 1 + 46.8)
        nlos = pl.calc_path_loss_dB(10.0, num_walls=2)
        assert np.isclose(nlos, 36.8 + 43.8 + 5.0)
        # array num_walls
        d = np.array([10.0, 10.0])
        walls = np.array([0, 2])
        both = pl.calc_path_loss_dB(d, num_walls=walls)
        assert np.allclose(both, [los, nlos])
        # inverse for LOS
        assert np.isclose(pl.which_distance_dB(los, 0), 10.0)

    def test_okomura_hata(self):
        pl = pathloss.PathLossOkomuraHata()
        urban = pathloss.PathLossOkomuraHata()
        urban.area_type = "medium city"
        sub = pl.calc_path_loss_dB(5.0)
        urb = urban.calc_path_loss_dB(5.0)
        # suburban correction reduces loss vs urban
        assert urb > sub
        assert np.isclose(urb - sub,
                          2 * (np.log10(900 / 28.0)) ** 2 + 5.4)
        # inverse
        assert np.isclose(urban.which_distance_dB(urb), 5.0)
        with pytest.raises(RuntimeError):
            pl.fc = 100.0
        with pytest.raises(RuntimeError):
            pl.area_type = "lake"

    def test_small_distance_handling(self):
        pl = pathloss.PathLossGeneral(n=2.0, C=0.0)
        with pytest.raises(RuntimeError):
            pl.calc_path_loss_dB(0.01)  # negative dB loss
        pl.handle_small_distances_bool = True
        assert pl.calc_path_loss_dB(0.01) == 0.0

    def test_shadowing(self):
        pl = pathloss.PathLossGeneral(n=3.0, C=100.0)
        pl.use_shadow_bool = True
        np.random.seed(0)
        vals = np.array([pl.calc_path_loss_dB(1.0) for _ in range(200)])
        assert np.isclose(vals.mean(), 100.0, atol=2.0)
        assert np.isclose(vals.std(), pl.sigma_shadow, rtol=0.3)
        # device path with explicit key
        v = pl.calc_path_loss_dB(jnp.asarray(1.0),
                                 shadow_key=jax.random.PRNGKey(0))
        assert np.ndim(np.asarray(v)) == 0


class TestNoise:
    def test_thermal_noise(self):
        # kT at 290K, 1 Hz: -174 dBm
        assert np.isclose(noise.calc_thermal_noise_power_dBm(290.0, 1.0),
                          -173.97, atol=0.05)
        assert np.isclose(
            noise.calc_thermal_noise_power_dBm(290.0, 20e6),
            -173.97 + 10 * np.log10(20e6), atol=0.05)


class TestAntennaGain:
    def test_omni(self):
        ant = antennagain.AntGainOmni()
        assert ant.get_antenna_gain(57.0) == 1.0
        ant2 = antennagain.AntGainOmni(3.0)
        assert np.isclose(ant2.get_antenna_gain(0.0), 10 ** 0.3)
        assert np.allclose(ant2.get_antenna_gain(np.array([0., 10.])),
                           10 ** 0.3)

    def test_3gpp_sectorized(self):
        ant = antennagain.AntGainBS3GPP25996(3)
        # boresight: full 14 dBi gain
        assert np.isclose(ant.get_antenna_gain(0.0), 10 ** 1.4)
        # 3dB point at theta_3db/2... pattern: -12*(35/70)^2 = -3 dB
        assert np.isclose(ant.get_antenna_gain(35.0),
                          10 ** ((14.0 - 3.0) / 10), rtol=1e-6)
        # attenuation capped at Am
        assert np.isclose(ant.get_antenna_gain(180.0),
                          10 ** ((14.0 - 20.0) / 10))
        with pytest.raises(ValueError):
            antennagain.AntGainBS3GPP25996(4)


class TestPathLossHierarchy:
    def test_indoor_outdoor_bases(self):
        from pyphysim_tpu.channels.pathloss import (
            PathLoss3GPP1, PathLossFreeSpace, PathLossGeneral,
            PathLossIndoorBase, PathLossMetisPS7, PathLossOkomuraHata,
            PathLossOutdoorBase)
        for cls in (PathLossGeneral, PathLossFreeSpace, PathLoss3GPP1,
                    PathLossOkomuraHata):
            assert issubclass(cls, PathLossOutdoorBase)
            assert cls.TYPE == "outdoor"
        assert issubclass(PathLossMetisPS7, PathLossIndoorBase)
        assert PathLossMetisPS7.TYPE == "indoor"


class TestHostBoundary:
    """Stateful convenience forms mirror the host boundary: numpy-complex
    in -> numpy-complex out (reference-style code works unchanged);
    device CArray in -> CArray out."""

    def _channel(self):
        gen = JakesSampleGenerator(Fd=30, Ts=3.25e-8, L=8)
        ch = TdlChannel(gen, channel_profile=COST259_TUx)
        ch.seed(0)
        return ch

    def test_tdl_numpy_in_numpy_out(self):
        ch = self._channel()
        rng = np.random.RandomState(3)
        x = rng.randn(32) + 1j * rng.randn(32)
        out = ch.corrupt_data(x)
        assert isinstance(out, np.ndarray) and np.iscomplexobj(out)
        assert out.shape == (32 + ch.num_taps_with_padding - 1,)
        # identical numerics to the CArray path on the same seed
        ch2 = self._channel()
        out2 = ch2.corrupt_data(cplx.carray(x))
        assert isinstance(out2, cplx.CArray)
        np.testing.assert_allclose(out, out2.to_numpy(), rtol=1e-5,
                                   atol=1e-6)

    def test_tdl_freq_domain_numpy_in_numpy_out(self):
        ch = self._channel()
        rng = np.random.RandomState(4)
        x = rng.randn(64) + 1j * rng.randn(64)
        out = ch.corrupt_data_in_freq_domain(x, 16)
        assert isinstance(out, np.ndarray) and np.iscomplexobj(out)
        assert out.shape == (64,)

    def test_su_mu_numpy_in_numpy_out(self):
        from pyphysim_tpu.channels.multiuser import MuChannel
        from pyphysim_tpu.channels.singleuser import SuChannel
        su = SuChannel()
        su.seed(1)
        rng = np.random.RandomState(5)
        x = rng.randn(20) + 1j * rng.randn(20)
        out = su.corrupt_data(x)
        assert isinstance(out, np.ndarray) and np.iscomplexobj(out)

        mu = MuChannel(N=2)
        mu.seed(2)
        xs = [rng.randn(16) + 1j * rng.randn(16) for _ in range(2)]
        outs = mu.corrupt_data(xs)
        assert isinstance(outs, list) and len(outs) == 2
        assert all(isinstance(o, np.ndarray) and np.iscomplexobj(o)
                   for o in outs)

    def test_multiuser_matrix_numpy_in_numpy_out(self):
        from pyphysim_tpu.channels.multiuser import MultiUserChannelMatrix
        m = MultiUserChannelMatrix()
        m.randomize(np.array([2, 2]), np.array([2, 2]), 2)
        rng = np.random.RandomState(6)
        data = [rng.randn(2, 8) + 1j * rng.randn(2, 8) for _ in range(2)]
        outs = m.corrupt_data(data)
        assert all(isinstance(o, np.ndarray) and np.iscomplexobj(o)
                   for o in outs)
        concat = np.concatenate(data, axis=0)
        big = m.corrupt_concatenated_data(concat)
        assert isinstance(big, np.ndarray) and np.iscomplexobj(big)
        # device input keeps device output
        big2 = m.corrupt_concatenated_data(cplx.carray(concat))
        assert isinstance(big2, cplx.CArray)
