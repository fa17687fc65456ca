"""Tests for pyphysim_tpu.modulators — closed-form expectations mirroring
the reference's tests/modulators_package_test.py strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyphysim_tpu.modulators import BPSK, OFDM, PSK, QAM, QPSK
from pyphysim_tpu.modulators.ofdm import OfdmOneTapEqualizer
from pyphysim_tpu.ops import cplx
from pyphysim_tpu.utils import misc


def bit_diff(a, b):
    return bin(int(a) ^ int(b)).count("1")


class TestPSK:
    def test_constellation_unit_energy(self):
        for M in (2, 4, 8, 16):
            psk = PSK(M)
            assert psk.M == M
            assert np.allclose(np.abs(psk.symbols), 1.0)

    def test_gray_neighbors(self):
        # angularly adjacent constellation points differ in exactly 1 bit
        psk = PSK(8)
        angles = np.angle(psk.symbols)
        order = np.argsort(angles)
        for i in range(8):
            a, b = order[i], order[(i + 1) % 8]
            assert bit_diff(a, b) == 1

    def test_modulate_demodulate_roundtrip(self):
        psk = PSK(16)
        data = np.random.RandomState(0).randint(0, 16, 1000)
        s = psk.modulate(data)
        assert np.array_equal(psk.demodulate(s), data)
        # device path
        dj = jnp.asarray(data)
        sj = psk.modulate(dj)
        assert np.array_equal(np.asarray(psk.demodulate(sj)), data)

    def test_modulate_invalid(self):
        with pytest.raises(ValueError):
            PSK(4).modulate(np.array([0, 1, 4]))

    def test_theoretical_ser_qpsk(self):
        qpsk = QPSK()
        # QPSK SER = 2Q(sqrt(2snr))sin(pi/4)...: 2Q(sqrt(snr)) approx
        snr = 10.0
        expected = 2 * misc.qfunc(
            np.sqrt(2 * 10 ** (snr / 10)) * np.sin(np.pi / 4))
        assert np.isclose(qpsk.calcTheoreticalSER(snr), expected)
        assert np.isclose(qpsk.calcTheoreticalBER(snr), expected / 2)

    def test_per_and_spectral_efficiency(self):
        qpsk = QPSK()
        ber = qpsk.calcTheoreticalBER(8.0)
        per = qpsk.calcTheoreticalPER(8.0, 100)
        assert np.isclose(per, 1 - (1 - ber) ** 100)
        se = qpsk.calcTheoreticalSpectralEfficiency(8.0, 100)
        assert np.isclose(se, 2 * (1 - per))


class TestBPSK:
    def test_mapping(self):
        b = BPSK()
        assert np.array_equal(b.modulate(np.array([0, 1])), [1, -1])

    def test_demod_device(self):
        b = BPSK()
        rx = cplx.from_numpy(np.array([0.3 + 1j, -0.2 + 0.5j]))
        assert np.array_equal(np.asarray(b.demodulate(rx)), [0, 1])

    def test_theoretical(self):
        assert np.isclose(BPSK().calcTheoreticalBER(6.0),
                          misc.qfunc(np.sqrt(2 * 10 ** 0.6)))


class TestQAM:
    def test_invalid_M(self):
        with pytest.raises(ValueError):
            QAM(32)  # not a square power of 2

    def test_unit_average_energy(self):
        for M in (4, 16, 64, 256):
            q = QAM(M)
            assert np.isclose(np.mean(np.abs(q.symbols) ** 2), 1.0)

    def test_gray_mapping_16qam(self):
        # the reference documents the 16-QAM Gray index matrix
        # [0,1,3,2,4,5,7,6,12,13,15,14,8,9,11,10] (fundamental.py:718-777)
        idx = QAM._calculateGrayMappingIndexQAM(4)
        assert np.array_equal(
            idx, [0, 1, 3, 2, 4, 5, 7, 6, 12, 13, 15, 14, 8, 9, 11, 10])

    def test_gray_neighbors_grid(self):
        q = QAM(16)
        s = q.symbols * np.sqrt((16 - 1) * 2 / 3)  # integer grid
        # horizontally adjacent points differ in exactly one bit
        for i in range(16):
            for j in range(16):
                d = s[i] - s[j]
                if abs(d) == 2:  # grid neighbors
                    assert bit_diff(i, j) == 1

    def test_roundtrip(self):
        for M in (4, 16, 64):
            q = QAM(M)
            data = np.random.RandomState(M).randint(0, M, 500)
            s = q.modulate(data)
            assert np.array_equal(q.demodulate(s), data)

    def test_demodulate_hard_matches_generic(self):
        q = QAM(64)
        key = jax.random.PRNGKey(0)
        data = jax.random.randint(key, (2000,), 0, 64)
        tx = q.modulate(data)
        noise = misc.randn_c(jax.random.PRNGKey(1), 2000) * 0.05
        rx = tx + noise
        generic = np.asarray(q.demodulate(rx))
        fast = np.asarray(q.demodulate_hard(rx))
        assert np.array_equal(generic, fast)

    def test_theoretical_curves(self):
        q = QAM(16)
        snr = np.array([0.0, 5.0, 10.0, 15.0])
        ser = q.calcTheoreticalSER(snr)
        ber = q.calcTheoreticalBER(snr)
        assert np.all(np.diff(ser) < 0)
        assert np.all(ber <= ser)
        # 16-QAM @ 10 dB: known approximation values
        Psc = 2 * (1 - 0.25) * misc.qfunc(np.sqrt(10.0 * 3 / 15))
        assert np.isclose(ser[2], 1 - (1 - Psc) ** 2)


class TestOFDM:
    def test_validation(self):
        with pytest.raises(ValueError):
            OFDM(64, 16, 65)
        with pytest.raises(ValueError):
            OFDM(64, 16, 51)  # odd
        with pytest.raises(ValueError):
            OFDM(64, -2, 52)

    def test_set_parameters(self):
        # ofdm.py:52-94: re-set parameters with validation
        ofdm = OFDM(64, 16, 52)
        ofdm.set_parameters(128, 32, 100)
        assert (ofdm.fft_size, ofdm.cp_size,
                ofdm.num_used_subcarriers) == (128, 32, 100)
        # derived subcarrier map follows the new parameters
        assert len(ofdm.get_used_subcarrier_indexes()) == 100
        with pytest.raises(ValueError):
            ofdm.set_parameters(64, 65)  # cp > fft
        ofdm.set_parameters(16, 4)       # default num_used = fft_size
        assert ofdm.num_used_subcarriers == 16

    def test_used_subcarrier_indexes(self):
        # doctest values from the reference (ofdm.py:205-219)
        assert np.array_equal(OFDM(16, 4, 10).get_used_subcarrier_indexes(),
                              [11, 12, 13, 14, 15, 1, 2, 3, 4, 5])
        assert np.array_equal(
            OFDM(16, 4, 14).get_used_subcarrier_indexes(),
            [9, 10, 11, 12, 13, 14, 15, 1, 2, 3, 4, 5, 6, 7])

    def test_roundtrip_host(self):
        ofdm = OFDM(64, 16, 52)
        rng = np.random.RandomState(3)
        data = (rng.randn(104) + 1j * rng.randn(104)).astype(np.complex64)
        tx = ofdm.modulate(data)
        assert tx.shape == (2 * (64 + 16),)
        rx = ofdm.demodulate(tx)
        assert np.allclose(rx, data, atol=1e-4)

    def test_roundtrip_device_batched(self):
        ofdm = OFDM(64, 16, 52)
        x = misc.randn_c(jax.random.PRNGKey(0), 5, 104)
        tx = ofdm.modulate(x)
        assert tx.shape == (5, 160)
        rx = ofdm.demodulate(tx)
        assert np.allclose(rx.to_numpy(), x.to_numpy(), atol=1e-4)

    def test_power_scale(self):
        # mean energy of the time-domain signal should match the data
        # energy times (used + cp)/... : with the reference scale, total tx
        # power = fft^2/(used+cp) spread over fft+cp samples per symbol.
        ofdm = OFDM(64, 16, 52)
        x = misc.randn_c(jax.random.PRNGKey(1), 100, 52)
        tx = ofdm.modulate(x)
        # Average energy per sample * num samples == used * scale / fft
        sig_energy = float(np.mean(np.sum(np.abs(tx.to_numpy())**2, -1)))
        # IFFT of spectrum with `used` unit-energy bins has energy used/fft
        # per fft samples; scale and CP change it deterministically:
        expected = 52 * (64 ** 2 / (52 + 16)) / 64 * (64 + 16) / 64
        assert np.isclose(sig_energy, expected, rtol=0.05)

    def test_zero_padding_host(self):
        ofdm = OFDM(16, 4, 10)
        data = np.ones(15, dtype=np.complex64)  # needs padding to 20
        tx = ofdm.modulate(data)
        assert tx.shape == (2 * 20,)
        rx = ofdm.demodulate(tx)
        assert np.allclose(rx[:15], data, atol=1e-5)
        assert np.allclose(rx[15:], 0, atol=1e-5)

    def test_device_requires_multiple(self):
        ofdm = OFDM(16, 4, 10)
        with pytest.raises(ValueError):
            ofdm.modulate(misc.randn_c(jax.random.PRNGKey(0), 15))

    def test_one_tap_equalizer_flat_channel(self):
        # a flat channel h scales all subcarriers; equalizer must undo it
        ofdm = OFDM(64, 16, 52)
        eq = OfdmOneTapEqualizer(ofdm)
        x = misc.randn_c(jax.random.PRNGKey(2), 104)
        tx = ofdm.modulate(x)
        h = 0.5 - 0.3j
        rx = tx * h
        demod = ofdm.demodulate(rx)

        class FlatIR:
            def get_freq_response(self, fft_size):
                n_samples = tx.shape[-1]
                return cplx.full((n_samples, fft_size), h)

        out = eq.equalize_data(demod, FlatIR())
        assert np.allclose(out.to_numpy(), x.to_numpy(), atol=1e-3)

    def test_one_tap_equalizer_sparse_fast_path_exact(self):
        # the used-bins sparse-DFT fast path must match the generic
        # average-the-full-frequency-response path bit-for-bit in f32
        from pyphysim_tpu.channels import (RayleighSampleGenerator,
                                           TdlChannel)
        ofdm = OFDM(64, 16, 52)
        eq = OfdmOneTapEqualizer(ofdm)
        ch = TdlChannel(RayleighSampleGenerator(),
                        tap_powers_dB=np.array([0.0, -3.0, -6.0]),
                        tap_delays=np.array([0.0, 3.0, 7.0]), Ts=1.0)
        n_sym = 4
        ir, _ = ch.generate_impulse_response_f(
            ch.init_state(jax.random.PRNGKey(5)), n_sym)
        data = misc.randn_c(jax.random.PRNGKey(6), n_sym * 52)

        out_fast = eq.equalize_data(data, ir)

        class GenericIR:  # hides tap_values_sparse -> generic path
            def get_freq_response(self, fft_size):
                return ir.get_freq_response(fft_size)

        out_generic = eq.equalize_data(data, GenericIR())
        assert np.allclose(out_fast.to_numpy(), out_generic.to_numpy(),
                           atol=1e-5)
