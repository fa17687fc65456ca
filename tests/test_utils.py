"""Tests for pyphysim_tpu.utils (L0), mirroring the reference's
tests/util_package_test.py strategy: closed-form expectations + property
checks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyphysim_tpu.utils import conversion as conv
from pyphysim_tpu.utils import misc
from pyphysim_tpu.utils import serialize


class TestConversion:
    def test_db_linear_roundtrip(self):
        assert np.isclose(conv.dB2Linear(30.0), 1000.0)
        assert np.isclose(conv.linear2dB(1000.0), 30.0)
        x = np.array([0.0, 10.0, 20.0])
        assert np.allclose(conv.linear2dB(conv.dB2Linear(x)), x)
        # traced path
        xj = jnp.asarray(x)
        assert np.allclose(np.asarray(conv.linear2dB(conv.dB2Linear(xj))), x)

    def test_dbm(self):
        assert np.isclose(conv.dBm2Linear(30.0), 1.0)  # 30 dBm = 1 W
        assert np.isclose(conv.linear2dBm(1.0), 30.0)
        assert np.isclose(conv.dBm2Linear(0.0), 1e-3)

    def test_gray(self):
        n = np.arange(16)
        g = conv.binary2gray(n)
        # Successive Gray codes differ in exactly one bit.
        diffs = np.array([int(bin(int(a ^ b)).count("1"))
                          for a, b in zip(g[:-1], g[1:])])
        assert np.all(diffs == 1)
        assert np.array_equal(conv.gray2binary(g), n)
        # jnp path
        gj = conv.binary2gray(jnp.arange(16))
        assert np.array_equal(np.asarray(gj), g)
        assert np.array_equal(np.asarray(conv.gray2binary(gj)), n)

    def test_snr_ebn0(self):
        # QPSK (2 bits): SNR = EbN0 + 3.01 dB
        assert np.isclose(conv.EbN0_dB_to_SNR_dB(10.0, 2), 13.0103, atol=1e-3)
        assert np.isclose(conv.SNR_dB_to_EbN0_dB(13.0103, 2), 10.0, atol=1e-3)

    def test_matrix_of_matrices(self):
        A = np.arange(36).reshape(6, 6)
        blocks = conv.single_matrix_to_matrix_of_matrices(A, [2, 4], [3, 3])
        assert blocks[0, 0].shape == (2, 3)
        assert blocks[1, 1].shape == (4, 3)
        assert np.array_equal(blocks[1, 0], A[2:6, 0:3])
        rows = conv.single_matrix_to_matrix_of_matrices(A, nrows=[2, 4])
        assert np.array_equal(rows[1], A[2:6])

    def test_blocks_to_single_matrix(self):
        blocks = np.random.randn(2, 3, 4, 5)
        big = conv.blocks_to_single_matrix(blocks)
        assert big.shape == (8, 15)
        assert np.array_equal(big[4:8, 5:10], blocks[1, 1])


class TestMiscRng:
    def test_randn_c_statistics(self):
        key = jax.random.PRNGKey(0)
        x = misc.randn_c(key, 200, 500)
        assert x.shape == (200, 500)
        x = x.to_numpy()
        assert x.dtype == np.complex64
        # E|x|^2 == 1, E[x] == 0
        assert np.isclose(np.mean(np.abs(x) ** 2), 1.0, atol=0.01)
        assert abs(np.mean(x)) < 0.01
        # circularity: E[x^2] ~ 0
        assert abs(np.mean(x ** 2)) < 0.01

    def test_randn_c_low_precision_moments(self):
        # randn_c corrects the measured bias of JAX's low-precision
        # normal sampler (bf16 raw mean is ~-0.011, a 22-sigma bias);
        # this guards the correction against upstream sampler changes
        import jax.numpy as jnp
        for dtype, mean_tol in ((jnp.bfloat16, 2.5e-3), (jnp.float16, 1e-3)):
            x = misc.randn_c(jax.random.PRNGKey(1), 2_000_000, dtype=dtype)
            re = np.asarray(x.re, np.float32)
            im = np.asarray(x.im, np.float32)
            n = re.size
            sem = np.sqrt(0.5 / n)
            assert abs(re.mean()) < max(4 * sem, mean_tol), dtype
            assert abs(im.mean()) < max(4 * sem, mean_tol), dtype
            # E|x|^2 == 1 after the spread correction
            power = (re.astype(np.float64) ** 2 + im.astype(np.float64) ** 2)
            assert np.isclose(power.mean(), 1.0, atol=0.01), dtype

    def test_randn_c_rs(self):
        rs = np.random.RandomState(42)
        x = misc.randn_c_RS(rs, 10000)
        assert np.isclose(np.mean(np.abs(x) ** 2), 1.0, atol=0.05)


class TestBitOps:
    def test_count_bits_scalar(self):
        assert misc.count_bits(0) == 0
        assert misc.count_bits(7) == 3
        assert misc.count_bits(255) == 8

    def test_count_bits_numpy(self):
        n = np.array([0, 1, 2, 3, 255, 1023])
        assert np.array_equal(misc.count_bits(n), [0, 1, 1, 2, 8, 10])

    def test_count_bits_jax(self):
        n = jnp.array([0, 1, 2, 3, 255, 1023])
        assert np.array_equal(np.asarray(misc.count_bits(n)),
                              [0, 1, 1, 2, 8, 10])

    def test_count_bit_errors(self):
        a = np.array([0b1010, 0b1111])
        b = np.array([0b0101, 0b1111])
        assert misc.count_bit_errors(a, b) == 4
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        assert int(misc.count_bit_errors(aj, bj)) == 4

    def test_native_bitops(self):
        pytest.importorskip("pyphysim_tpu.utils._bitops")
        from pyphysim_tpu.utils import _bitops
        n = np.array([0, 1, 3, 255, 2**40 - 1], dtype=np.uint64)
        assert np.array_equal(_bitops.popcount(n), [0, 1, 2, 8, 40])
        a = np.array([0b1010, 0b1111], dtype=np.uint64)
        b = np.array([0b0101, 0b1111], dtype=np.uint64)
        assert _bitops.count_bit_errors(a, b) == 4

    def test_level2bits_int2bits(self):
        assert [misc.level2bits(i) for i in (2, 4, 8, 16, 256)] == \
            [1, 2, 3, 4, 8]
        assert misc.int2bits(0) == 1
        assert misc.int2bits(1) == 1
        assert misc.int2bits(2) == 2
        assert misc.int2bits(255) == 8
        with pytest.raises(ValueError):
            misc.level2bits(0)


class TestQfunc:
    def test_qfunc_values(self):
        assert np.isclose(misc.qfunc(0.0), 0.5)
        assert np.isclose(misc.qfunc(1.0), 0.158655, atol=1e-5)
        assert np.isclose(misc.qfunc(3.0), 0.001349, atol=1e-5)
        xj = jnp.array([0.0, 1.0])
        assert np.allclose(np.asarray(misc.qfunc(xj)), [0.5, 0.158655],
                           atol=1e-5)

    def test_qfunc_inv(self):
        for p in [0.4, 0.1, 0.01, 1e-4]:
            assert np.isclose(misc.qfunc(misc.qfunc_inv(p)), p, rtol=1e-5)

    def test_confidence_interval(self):
        lo, hi = misc.calc_confidence_interval(10.0, 2.0, 100, P=95.0)
        # z(95%) = 1.96 -> +/- 1.96*2/10 = 0.392
        assert np.isclose(lo, 10 - 0.392, atol=1e-3)
        assert np.isclose(hi, 10 + 0.392, atol=1e-3)


class TestLinalg:
    def test_gmd(self):
        rng = np.random.RandomState(0)
        A = rng.randn(4, 4) + 1j * rng.randn(4, 4)
        U, S, V_H = np.linalg.svd(A)
        Q, R, P = misc.gmd(U, S, V_H)
        # reconstruction
        assert np.allclose(Q @ R @ P.conj().T, A, atol=1e-8)
        # unitarity
        assert np.allclose(Q.conj().T @ Q, np.eye(4), atol=1e-8)
        assert np.allclose(P.conj().T @ P, np.eye(4), atol=1e-8)
        # R upper triangular with equal diagonal = geometric mean of S
        assert np.allclose(np.tril(R, -1), 0, atol=1e-8)
        gm = np.exp(np.mean(np.log(S)))
        assert np.allclose(np.abs(np.diag(R)), gm, atol=1e-6)

    def test_gmd_tall(self):
        rng = np.random.RandomState(1)
        A = rng.randn(6, 3) + 1j * rng.randn(6, 3)
        U, S, V_H = np.linalg.svd(A, full_matrices=False)
        Q, R, P = misc.gmd(U, S, V_H)
        assert np.allclose(Q @ R @ P.conj().T, A, atol=1e-8)
        gm = np.exp(np.mean(np.log(S)))
        assert np.allclose(np.abs(np.diag(R)), gm, atol=1e-6)

    def test_peig_leig(self):
        rng = np.random.RandomState(3)
        X = rng.randn(5, 5) + 1j * rng.randn(5, 5)
        A = X @ X.conj().T  # Hermitian PSD
        Vp, Dp = misc.peig(A, 2)
        Vl, Dl = misc.leig(A, 2)
        w = np.linalg.eigvalsh(A)
        assert np.allclose(sorted(np.abs(Dp)), sorted(w[-2:]), atol=1e-8)
        assert np.allclose(sorted(np.abs(Dl)), sorted(w[:2]), atol=1e-8)
        # eigenvector property
        for i in range(2):
            v = Vp[:, i]
            assert np.allclose(A @ v, Dp[i] * v, atol=1e-6)

    def test_peig_h_batched(self):
        rng = np.random.RandomState(4)
        X = rng.randn(3, 4, 4) + 1j * rng.randn(3, 4, 4)
        A = jnp.asarray(X @ np.conj(np.transpose(X, (0, 2, 1))))
        V, D = misc.peig_h(A, 2)
        assert V.shape == (3, 4, 2)
        w = np.linalg.eigvalsh(np.asarray(A))
        assert np.allclose(np.asarray(D), w[:, ::-1][:, :2], atol=1e-4)
        V2, D2 = misc.leig_h(A, 1)
        assert np.allclose(np.asarray(D2)[:, 0], w[:, 0], atol=1e-4)

    def test_least_right_singular_vectors(self):
        rng = np.random.RandomState(5)
        A = rng.randn(6, 4) + 1j * rng.randn(6, 4)
        V0, V1, S = misc.least_right_singular_vectors(A, 1)
        assert V0.shape == (4, 1)
        assert V1.shape == (4, 3)
        # V0 spans the LEAST right singular vector; S ascending for V1
        _, s, vh = np.linalg.svd(A)
        Vfull = vh.conj().T
        proj = Vfull[:, -1:].conj().T @ V0
        assert np.allclose(np.abs(proj), 1.0, atol=1e-8)
        assert np.allclose(S, s[::-1][1:])
        assert np.all(np.diff(S) >= 0)
        # reference doctest example (misc.py:631-644)
        B = np.array([1, 2, 3, 6, 5, 4, 2, 2, 1], dtype=float).reshape(3, 3)
        min_Vs, remaining_Vs, S2 = misc.least_right_singular_vectors(B, 1)
        assert np.allclose(np.abs(min_Vs[:, 0]),
                           np.abs([-0.4474985, 0.81116484, -0.3765059]))
        assert np.allclose(S2, [1.88354706, 9.81370681])

    def test_update_inv_sum_diag(self):
        rng = np.random.RandomState(6)
        A = rng.randn(4, 4) + 1j * rng.randn(4, 4) + 5 * np.eye(4)
        d = rng.rand(4)
        out = misc.update_inv_sum_diag(np.linalg.inv(A), d)
        assert np.allclose(out, np.linalg.inv(A + np.diag(d)), atol=1e-8)

    def test_principal_components(self):
        rng = np.random.RandomState(7)
        A = rng.randn(6, 4)
        A2 = misc.get_principal_component_matrix(A, 2)
        # reference semantics (misc.py:870-908): dead dimensions removed,
        # out = U @ diag-padded(S_kept) @ V_H[:, :2]  -> shape (6, 2)
        u, s, vh = np.linalg.svd(A)
        expected = u[:, :2] @ np.diag(s[:2]) @ vh[:2, :2]
        assert A2.shape == (6, 2)
        assert np.allclose(A2, expected, atol=1e-8)

    def test_whitening(self):
        rng = np.random.RandomState(8)
        X = rng.randn(4, 4) + 1j * rng.randn(4, 4)
        R = X @ X.conj().T + np.eye(4)
        W = misc.calc_whitening_matrix(R)
        assert np.allclose(W.conj().T @ R @ W, np.eye(4), atol=1e-7)
        D = misc.calc_decorrelation_matrix(R)
        M = D.conj().T @ R @ D
        assert np.allclose(M - np.diag(np.diag(M)), 0, atol=1e-7)

    def test_shannon_sum_capacity(self):
        assert np.isclose(misc.calc_shannon_sum_capacity(np.array([1.0, 3.0])),
                          1.0 + 2.0)

    def test_autocorr(self):
        x = np.array([4, 2, 1, 3, 7, 3, 8])
        assert np.array_equal(misc.calc_unorm_autocorr(x),
                              [152, 79, 82, 53, 42, 28, 32])
        r = misc.calc_autocorr(x)
        assert np.allclose(r, [1.0, -0.025, 0.15, -0.175, -0.25, -0.2, 0.0])


class TestFormatting:
    def test_pretty_time(self):
        assert misc.pretty_time(3.27) == "3.27s"
        assert misc.pretty_time(65) == "1m:05s"
        assert misc.pretty_time(3723) == "1h:02m:03s"

    def test_range_representation(self):
        assert misc.get_range_representation(np.array([0, 5, 10, 15])) \
            == "0:5:15"
        assert misc.get_range_representation(
            np.array([0, 5, 10, 15]), filename_mode=True) == "0_(5)_15"
        assert misc.get_range_representation(np.array([1, 2, 5])) is None
        assert misc.get_range_representation(np.array([7])) == "7"

    def test_replace_dict_values(self):
        name = misc.replace_dict_values(
            "results_{M}_{SNR}", {"M": 4, "SNR": np.array([0, 5, 10, 15])},
            filename_mode=True)
        assert name == "results_4_[0_(5)_15]"

    def test_equal_dicts(self):
        a = {"x": 1, "y": np.array([1, 2])}
        b = {"x": 1, "y": np.array([1, 2]), "z": 9}
        assert misc.equal_dicts(a, b, ignore_keys=["z"])
        assert not misc.equal_dicts(a, b)


class TestSerialize:
    def test_ndarray_roundtrip(self):
        x = np.arange(6, dtype=np.float64).reshape(2, 3)
        y = serialize.loads(serialize.dumps({"a": x, "s": {1, 2}}))
        assert np.array_equal(y["a"], x)
        assert y["a"].dtype == x.dtype
        assert y["s"] == {1, 2}

    def test_complex_roundtrip(self):
        x = (np.random.randn(3, 2) + 1j * np.random.randn(3, 2)).astype(
            np.complex64)
        y = serialize.loads(serialize.dumps(x))
        assert np.allclose(y, x)
        assert y.dtype == np.complex64

    def test_public_to_dict_from_dict(self):
        # serialize.py:135-179: public wrappers over _to_dict/_from_dict
        from pyphysim_tpu.simulations import Result
        r = Result.create("ber", Result.RATIOTYPE, 3, 10)
        d = r.to_dict()
        assert isinstance(d, dict)
        r2 = Result.from_dict(d)
        assert r2.get_result() == r.get_result()
        assert r2.name == "ber"


class TestSeedReplay:
    def test_capture_and_replay(self, tmp_path):
        import jax
        from pyphysim_tpu.utils.testing import SeedReplay

        folder = str(tmp_path / "replays")
        # first run fails -> keys captured
        try:
            with SeedReplay("t.pickle", folder=folder) as sr:
                k = sr.key("chan", jax.random.PRNGKey(7))
                s = sr.seed("noise", 42)
                raise AssertionError("boom")
        except AssertionError:
            pass
        import os
        assert os.path.exists(os.path.join(folder, "t.pickle"))

        # second run replays the SAME keys
        with SeedReplay("t.pickle", folder=folder) as sr:
            assert sr.replaying
            k2 = sr.key("chan", jax.random.PRNGKey(999))
            s2 = sr.seed("noise", 1)
            assert np.array_equal(np.asarray(k2), np.asarray(k))
            assert s2 == 42
        # success removed the replay file
        assert not os.path.exists(os.path.join(folder, "t.pickle"))
