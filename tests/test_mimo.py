"""Tests for pyphysim_tpu.mimo — each scheme checked for perfect recovery
over a noiseless channel, stream ordering, power constraints, and Alamouti
combining gains (mirrors tests/mimo_package_test.py strategy)."""

import jax
import numpy as np
import pytest

from pyphysim_tpu.mimo import (MRC, MRT, Alamouti, Blast, GMDMimo, SVDMimo,
                               calc_post_processing_linear_SINRs)
from pyphysim_tpu.ops import cplx
from pyphysim_tpu.utils.misc import randn_c, randn_c_RS


def rand_channel(nr, nt, seed=0):
    rs = np.random.RandomState(seed)
    return randn_c_RS(rs, nr, nt).astype(np.complex64)


def rand_data(n, seed=1):
    rs = np.random.RandomState(seed)
    return randn_c_RS(rs, n).astype(np.complex64)


class TestBlast:
    def test_encode_power_and_layout(self):
        h = rand_channel(4, 3)
        blast = Blast(h)
        assert blast.getNumberOfLayers() == 3
        data = np.arange(9).astype(np.complex64)
        enc = blast.encode(data)
        assert enc.shape == (3, 3)
        # column-major layout: first column is [0,1,2]/sqrt(3)
        assert np.allclose(enc[:, 0] * np.sqrt(3), [0, 1, 2])
        # total power split by Nt
        assert np.isclose(np.sum(np.abs(enc) ** 2),
                          np.sum(np.abs(data) ** 2) / 3)

    def test_zf_roundtrip(self):
        h = rand_channel(4, 3)
        blast = Blast(h)
        data = rand_data(30)
        rx = h @ blast.encode(data)
        dec = blast.decode(rx)
        assert np.allclose(dec, data, atol=1e-3)

    def test_mmse_roundtrip_high_snr(self):
        h = rand_channel(4, 4)
        blast = Blast(h)
        blast.set_noise_var(1e-6)
        data = rand_data(40)
        rx = h @ blast.encode(data)
        assert np.allclose(blast.decode(rx), data, atol=1e-2)

    def test_invalid_input_size(self):
        blast = Blast(rand_channel(3, 3))
        with pytest.raises(ValueError):
            blast.encode(rand_data(10))
        with pytest.raises(ValueError):
            blast.set_noise_var(-1.0)

    def test_calc_SINRs_dB_relation(self):
        # mimo.py:311-348: calc_SINRs == linear2dB(calc_linear_SINRs)
        blast = Blast(rand_channel(4, 3))
        lin = np.asarray(blast.calc_linear_SINRs(0.01))
        dB = np.asarray(blast.calc_SINRs(0.01))
        assert lin.shape == (3,)
        assert np.all(lin > 0)
        assert np.allclose(dB, 10 * np.log10(lin), atol=1e-4)

    def test_batched_device_path(self):
        # 5 channels at once through the CArray path
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        h = randn_c(keys[0], 5, 4, 3)
        data = randn_c(keys[1], 5, 30)
        blast = Blast(h)
        enc = blast.encode(data)
        assert enc.shape == (5, 3, 10)
        rx = cplx.matmul(h, enc)
        dec = blast.decode(rx)
        assert np.allclose(dec.to_numpy(), data.to_numpy(), atol=1e-2)


class TestMRT:
    def test_beamforming_gain(self):
        h = rand_channel(1, 4)
        mrt = MRT(h)
        data = rand_data(10)
        enc = mrt.encode(data)  # (4, 10)
        assert enc.shape == (4, 10)
        rx = (h @ enc)[0]
        # constructive combining: |rx| = sum|h| / sqrt(Nt) * |data|
        expected_gain = np.sum(np.abs(h)) / 2.0
        assert np.allclose(np.abs(rx), expected_gain * np.abs(data),
                           atol=1e-4)
        dec = mrt.decode(rx)
        assert np.allclose(dec, data, atol=1e-4)

    def test_1d_channel(self):
        h = rand_channel(1, 4)[0]
        mrt = MRT(h)
        assert mrt.Nt == 4
        assert mrt.getNumberOfLayers() == 1


class TestMRC:
    def test_combining(self):
        h = rand_channel(4, 1)[:, 0]  # 1D channel (Nr,)
        mrc = MRC(h)
        data = rand_data(20)
        rx = np.outer(h, data)  # (4, 20), single tx antenna
        dec = mrc.decode(rx)
        assert np.allclose(dec, data, atol=1e-3)

    def test_mrc_sinr_gain(self):
        # MRC SINR = sum |h_i|^2 / noise_var
        h = rand_channel(2, 1)
        sinrs = calc_post_processing_linear_SINRs(
            h, cplx.from_numpy(np.eye(1, dtype=np.complex64)),
            cplx.from_numpy(np.conj(h.T)), noise_var=0.1)
        expected = (np.sum(np.abs(h) ** 2)) ** 2 / \
            (0.1 * np.sum(np.abs(h) ** 2))
        assert np.isclose(np.asarray(sinrs)[0], expected, rtol=1e-3)


class TestSVD:
    def test_roundtrip_and_diagonalization(self):
        h = rand_channel(3, 3)
        svd = SVDMimo(h)
        data = rand_data(30)
        enc = svd.encode(data)
        rx = h @ enc
        dec = svd.decode(rx)
        assert np.allclose(dec, data, atol=1e-2)
        # effective channel G_H H W is diagonal
        W = svd._calc_precoder(cplx.from_numpy(h)).to_numpy()
        G_H = svd._calc_receive_filter(cplx.from_numpy(h)).to_numpy()
        eff = G_H @ h @ W
        assert np.allclose(eff - np.diag(np.diag(eff)), 0, atol=1e-2)


class TestGMD:
    def test_roundtrip_and_equal_diagonal(self):
        h = rand_channel(3, 3)
        g = GMDMimo(h)
        data = rand_data(30)
        rx = h @ g.encode(data)
        dec = g.decode(rx)
        assert np.allclose(dec, data, atol=1e-2)
        # effective channel Q R has equal-magnitude diagonal
        W = g._calc_precoder(cplx.from_numpy(h)).to_numpy() * np.sqrt(3)
        eff = h @ W  # = Q R
        r = np.abs(np.diag(np.linalg.qr(eff)[1]))
        assert np.allclose(r, r[0], rtol=1e-4)


class TestAlamouti:
    def test_encode_structure(self):
        h = rand_channel(2, 2)
        al = Alamouti(h)
        data = np.array([1 + 1j, 2 - 1j, 3 + 0j, 0 - 2j],
                        dtype=np.complex64)
        enc = al.encode(data) * np.sqrt(2)
        # antenna 0: [x0, -x1*, x2, -x3*]; antenna 1: [x1, x0*, x3, x2*]
        assert np.allclose(enc[0], [1 + 1j, -2 - 1j, 3, -2j])
        assert np.allclose(enc[1], [2 - 1j, 1 - 1j, -2j, 3])

    def test_roundtrip(self):
        for nr in (1, 2, 4):
            h = rand_channel(nr, 2, seed=nr)
            al = Alamouti(h)
            data = rand_data(20, seed=nr + 1)
            rx = h @ al.encode(data)
            dec = al.decode(rx)
            assert np.allclose(dec, data, atol=1e-3), nr

    def test_sinr(self):
        h = rand_channel(2, 2)
        al = Alamouti(h)
        sinr = float(np.asarray(al.calc_linear_SINRs(0.5)))
        assert np.isclose(sinr, np.linalg.norm(h, "fro") ** 2 / 0.5,
                          rtol=1e-4)

    def test_requires_two_tx(self):
        with pytest.raises(ValueError):
            Alamouti(rand_channel(2, 3))
        with pytest.raises(ValueError):
            Alamouti(rand_channel(2, 2)).encode(rand_data(5))

    def test_batched(self):
        keys = jax.random.split(jax.random.PRNGKey(3), 2)
        h = randn_c(keys[0], 6, 2, 2)
        data = randn_c(keys[1], 6, 10)
        al = Alamouti(h)
        enc = al.encode(data)
        assert enc.shape == (6, 2, 10)
        rx = cplx.matmul(h, enc)
        dec = al.decode(rx)
        assert np.allclose(dec.to_numpy(), data.to_numpy(), atol=1e-3)

    def test_ber_diversity_gain(self):
        # Alamouti 2x1 over Rayleigh should beat SISO at the same SNR
        from pyphysim_tpu.modulators import QPSK
        import jax.numpy as jnp
        from pyphysim_tpu.utils.misc import count_bit_errors
        qpsk = QPSK()
        n = 200
        snr = 10 ** (15 / 10)

        def alamouti_rep(key):
            k1, k2, k3 = jax.random.split(key, 3)
            data = jax.random.randint(k1, (n,), 0, 4)
            tx = qpsk.modulate(data)
            h = randn_c(k2, 1, 2)
            al = Alamouti(h)
            rx = cplx.matmul(h, al.encode(tx)) + \
                randn_c(k3, 1, n) * jnp.sqrt(1 / snr)
            dec = qpsk.demodulate(al.decode(rx))
            return count_bit_errors(data, dec)

        def siso_rep(key):
            k1, k2, k3 = jax.random.split(key, 3)
            data = jax.random.randint(k1, (n,), 0, 4)
            tx = qpsk.modulate(data)
            h = randn_c(k2)
            rx = tx * h + randn_c(k3, n) * jnp.sqrt(1 / snr)
            dec = qpsk.demodulate(rx / h)
            return count_bit_errors(data, dec)

        keys = jax.random.split(jax.random.PRNGKey(0), 500)
        al_err = int(jnp.sum(jax.vmap(alamouti_rep)(keys)))
        si_err = int(jnp.sum(jax.vmap(siso_rep)(keys)))
        assert al_err < si_err / 2  # diversity order 2 vs 1
