"""Tests for multiuser channels, waterfilling, block diagonalization and
subspace projections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyphysim_tpu.channels import (MuChannel, MuMimoChannel,
                                   MultiUserChannelMatrix,
                                   MultiUserChannelMatrixExtInt,
                                   RayleighSampleGenerator)
from pyphysim_tpu.channels.singleuser import SuChannel, SuMimoChannel
from pyphysim_tpu.comm import (BlockDiagonalizer, EnhancedBD, WhiteningBD,
                               doWF)
from pyphysim_tpu.comm.waterfilling import doWF_jit
from pyphysim_tpu.ops import cplx
from pyphysim_tpu.subspace import (Projection, calcProjectionMatrix,
                                   calcOrthogonalProjectionMatrix)
from pyphysim_tpu.utils.misc import randn_c, randn_c_RS


def rand_c(shape, seed=0):
    rs = np.random.RandomState(seed)
    return randn_c_RS(rs, *shape)


class TestSuChannel:
    def test_pathloss_scaling(self):
        su = SuChannel()
        su.set_pathloss(0.25)
        su.seed(0)
        x = randn_c(jax.random.PRNGKey(1), 50)
        out = su.corrupt_data(x)
        su2 = SuChannel()
        su2.seed(0)
        out2 = su2.corrupt_data(x)
        assert np.allclose(out.to_numpy(), 0.5 * out2.to_numpy(), atol=1e-5)
        with pytest.raises(ValueError):
            su.set_pathloss(2.0)

    def test_su_mimo(self):
        su = SuMimoChannel(N=3)
        assert su.num_tx_antennas == 3
        assert su.num_rx_antennas == 3
        x = randn_c(jax.random.PRNGKey(0), 3, 10)
        su.seed(1)
        out = su.corrupt_data(x)
        assert out.shape == (3, 10)


class TestMuChannel:
    def test_interference_sum(self):
        mu = MuChannel(N=2)
        mu.seed(0)
        x = randn_c(jax.random.PRNGKey(1), 2, 30)
        out = mu.corrupt_data(x)
        assert len(out) == 2
        # manual: out[r] = sum_t su[r][t](x[t]) using last irs
        for r in range(2):
            acc = np.zeros(30, complex)
            for t in range(2):
                ir = mu.get_last_impulse_response(r, t)
                taps = ir.tap_values_sparse.to_numpy()[0]
                acc += taps * x.to_numpy()[t]
            assert np.allclose(out[r].to_numpy(), acc, atol=1e-4)

    def test_independent_links(self):
        mu = MuChannel(N=2)
        mu.seed(3)
        x = randn_c(jax.random.PRNGKey(1), 2, 10)
        mu.corrupt_data(x)
        h00 = mu.get_last_impulse_response(0, 0).tap_values_sparse.to_numpy()
        h01 = mu.get_last_impulse_response(0, 1).tap_values_sparse.to_numpy()
        assert not np.allclose(h00, h01)

    def test_mu_mimo_shapes(self):
        mu = MuMimoChannel(N=2, num_rx_antennas=2, num_tx_antennas=3)
        mu.seed(0)
        x = randn_c(jax.random.PRNGKey(1), 2, 3, 12)
        out = mu.corrupt_data([x[0], x[1]])
        assert len(out) == 2
        assert out[0].shape == (2, 12)


class TestMultiUserChannelMatrix:
    def make(self, K=3, Nr=2, Nt=2, seed=0):
        mu = MultiUserChannelMatrix()
        mu.set_channel_seed(seed)
        mu.randomize(Nr, Nt, K)
        return mu

    def test_randomize_shapes(self):
        mu = self.make()
        assert mu.K == 3
        assert mu.big_H.shape == (6, 6)
        assert mu.H.shape == (3, 3, 2, 2)
        assert np.array_equal(mu.Nr, [2, 2, 2])

    def test_get_Hkl_consistency(self):
        mu = self.make()
        big = mu.big_H.to_numpy()
        h12 = mu.get_Hkl(1, 2).to_numpy()
        assert np.allclose(h12, big[2:4, 4:6])
        hk = mu.get_Hk(1).to_numpy()
        assert np.allclose(hk, big[2:4, :])

    def test_init_from_channel_matrix_and_corrupt(self):
        mu = MultiUserChannelMatrix()
        H = rand_c((4, 4), 1)
        mu.init_from_channel_matrix(H, np.array([2, 2]), np.array([2, 2]), 2)
        mu.noise_var = None
        data = [rand_c((2, 5), 2), rand_c((2, 5), 3)]
        out = mu.corrupt_data(data)
        concat = np.vstack([d for d in data])
        expected = H @ concat
        # numpy data in -> numpy complex out (host-boundary convention)
        assert isinstance(out[0], np.ndarray)
        assert np.allclose(out[0], expected[:2], atol=1e-4)
        assert np.allclose(out[1], expected[2:], atol=1e-4)

    def test_noise_added(self):
        mu = self.make()
        mu.noise_var = 0.1
        data = [rand_c((2, 1000), i) for i in range(3)]
        out = mu.corrupt_data(data)
        assert mu.last_noise is not None
        noise_power = np.mean(np.abs(mu.last_noise.to_numpy()) ** 2)
        assert np.isclose(noise_power, 0.1, rtol=0.15)

    def test_pathloss_scaling(self):
        mu = MultiUserChannelMatrix()
        H = np.ones((2, 2), dtype=complex)
        mu.init_from_channel_matrix(H, np.array([1, 1]), np.array([1, 1]), 2)
        pl = np.array([[1.0, 0.25], [0.04, 1.0]])
        mu.set_pathloss(pl)
        big = mu.big_H.to_numpy()
        assert np.allclose(np.abs(big), [[1, 0.5], [0.2, 1]])

    def test_calc_Q(self):
        mu = self.make(K=2)
        mu.noise_var = 0.1
        F = [cplx.from_numpy(rand_c((2, 1), 5)),
             cplx.from_numpy(rand_c((2, 1), 6))]
        Q0 = mu.calc_Q(0, F).to_numpy()
        # manual
        H01 = mu.get_Hkl(0, 1).to_numpy()
        F1 = F[1].to_numpy()
        expected = H01 @ F1 @ F1.conj().T @ H01.conj().T + 0.1 * np.eye(2)
        assert np.allclose(Q0, expected, atol=1e-4)

    def test_calc_SINR_perfect_alignment(self):
        # orthogonal precoders/filters on a diagonal channel -> huge SINR
        mu = MultiUserChannelMatrix()
        H = np.kron(np.eye(2), np.array([[1.0, 0], [0, 1.0]])).astype(
            complex)
        mu.init_from_channel_matrix(H, np.array([2, 2]), np.array([2, 2]), 2)
        mu.noise_var = 1e-8
        F = [cplx.from_numpy(np.array([[1.0], [0]], dtype=complex)),
             cplx.from_numpy(np.array([[1.0], [0]], dtype=complex))]
        U = F
        sinrs = mu.calc_SINR(F, U)
        assert float(np.asarray(sinrs[0])[0]) > 1e6

    def test_calc_SINR_matches_manual(self):
        mu = self.make(K=2, seed=7)
        mu.noise_var = 0.05
        F = [cplx.from_numpy(rand_c((2, 2), 8) / 2),
             cplx.from_numpy(rand_c((2, 2), 9) / 2)]
        U = [cplx.from_numpy(rand_c((2, 2), 10)),
             cplx.from_numpy(rand_c((2, 2), 11))]
        sinrs = mu.calc_SINR(F, U)
        # manual for user 0, stream 0
        H00 = mu.get_Hkl(0, 0).to_numpy()
        H01 = mu.get_Hkl(0, 1).to_numpy()
        F0, F1 = F[0].to_numpy(), F[1].to_numpy()
        U0 = U[0].to_numpy()
        first = (H00 @ F0 @ F0.conj().T @ H00.conj().T +
                 H01 @ F1 @ F1.conj().T @ H01.conj().T +
                 0.05 * np.eye(2))
        v = F0[:, 0:1]
        B00 = first - H00 @ v @ v.conj().T @ H00.conj().T
        u = U0[:, 0:1]
        num = np.abs(u.conj().T @ H00 @ v) ** 2
        den = np.abs(u.conj().T @ B00 @ u)
        assert np.isclose(float(np.asarray(sinrs[0])[0]),
                          float(num / den), rtol=1e-3)

    def test_jit_vmap_randomize_and_sinr(self):
        # the whole (randomize -> SINR) flow must jit over realizations
        mu = MultiUserChannelMatrix()
        mu.randomize(2, 2, 2)  # set counts

        @jax.jit
        def run(key):
            m = MultiUserChannelMatrix()
            m.noise_var = 0.1
            m.randomize(2, 2, 2, key=key)
            F = [cplx.from_numpy(np.eye(2, 1).astype(complex))] * 2
            return m.calc_SINR(F, F)[0]

        out = run(jax.random.PRNGKey(0))
        assert np.asarray(out).shape == (1,)


class TestMultiUserChannelMatrixExtInt:
    def test_shapes(self):
        mu = MultiUserChannelMatrixExtInt()
        mu.set_channel_seed(0)
        mu.randomize(2, 2, 2, NtE=1)
        assert mu.K == 2
        assert mu.extIntK == 1
        assert mu.big_H.shape == (4, 5)
        assert mu.big_H_no_ext_int.shape == (4, 4)
        assert mu.get_Hk_with_ext_int(0).shape == (2, 5)
        assert mu.get_Hk_without_ext_int(0).shape == (2, 4)

    def test_ext_int_covariance(self):
        mu = MultiUserChannelMatrixExtInt()
        mu.set_channel_seed(1)
        mu.randomize(2, 2, 2, NtE=1)
        mu.noise_var = 0.1
        pe = 0.5
        R = mu.calc_cov_matrix_extint_plus_noise(pe)
        he = mu.get_Hkl(0, 2).to_numpy()
        expected = pe * he @ he.conj().T + 0.1 * np.eye(2)
        assert np.allclose(R[0].to_numpy(), expected, atol=1e-4)

    def test_corrupt_with_ext_data(self):
        mu = MultiUserChannelMatrixExtInt()
        H = rand_c((2, 3), 2)
        mu.init_from_channel_matrix(H, np.array([1, 1]),
                                    np.array([1, 1]), 2, NtE=1)
        data = [rand_c((1, 4), 3), rand_c((1, 4), 4)]
        ext = [rand_c((1, 4), 5)]
        out = mu.corrupt_data(data, ext)
        concat = np.vstack(data + ext)
        expected = H @ concat
        assert isinstance(out[0], np.ndarray)
        assert np.allclose(out[0], expected[0:1], atol=1e-4)


class TestWaterfilling:
    def test_total_power_and_level(self):
        gains = np.array([1.0, 0.5, 0.1])
        p, mu = doWF(gains, 10.0, noiseVar=1.0)
        assert np.isclose(p.sum(), 10.0)
        # water level equalization: p_i + N/g_i == mu for active channels
        for i in range(3):
            if p[i] > 0:
                assert np.isclose(p[i] + 1.0 / gains[i], mu, rtol=1e-6)

    def test_channel_dropping(self):
        gains = np.array([1.0, 1e-4])
        p, _ = doWF(gains, 1.0, noiseVar=1.0)
        assert p[1] == 0.0  # terrible channel dropped
        assert np.isclose(p[0], 1.0)

    def test_jit_variant_matches(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            gains = rng.rand(5) + 0.01
            pt = rng.rand() * 10 + 0.1
            p_ref, mu_ref = doWF(gains, pt, noiseVar=0.7)
            p_jit, mu_jit = doWF_jit(jnp.asarray(gains), pt, noise_var=0.7)
            assert np.allclose(np.asarray(p_jit), p_ref, atol=1e-4)
            assert np.isclose(float(np.asarray(mu_jit)), mu_ref, atol=1e-4)


class TestProjections:
    def test_projection_matrix(self):
        A = rand_c((4, 2), 0)
        Q = calcProjectionMatrix(A)
        # projector: Q^2 = Q, Q A = A
        assert np.allclose(Q @ Q, Q, atol=1e-6)
        assert np.allclose(Q @ A, A, atol=1e-6)
        oQ = calcOrthogonalProjectionMatrix(A)
        assert np.allclose(oQ @ A, 0, atol=1e-6)

    def test_projection_object_and_carray(self):
        A = rand_c((3, 1), 1)
        p = Projection(A)
        v = rand_c((3, 1), 2)
        assert np.allclose(p.project_matrix(v) +
                           p.project_matrix_onto_orthogonal_space(v), v,
                           atol=1e-6)
        Qc = calcProjectionMatrix(cplx.from_numpy(A))
        assert np.allclose(Qc.to_numpy(), calcProjectionMatrix(A), atol=1e-4)


class TestProjectionAliases:
    def test_reference_named_methods(self):
        # projections.py:46-171: project/oProject/reflect + staticmethods
        from pyphysim_tpu.subspace.projections import Projection
        rng = np.random.default_rng(0)
        A = rng.standard_normal((4, 2)) + 1j * rng.standard_normal((4, 2))
        v = rng.standard_normal((4, 1)) + 1j * rng.standard_normal((4, 1))
        p = Projection(A)
        assert np.allclose(p.project(v), p.project_matrix(v))
        assert np.allclose(p.oProject(v),
                           p.project_matrix_onto_orthogonal_space(v))
        assert np.allclose(p.reflect(v), p.reflect_matrix(v))
        # projected + orthogonal = original
        assert np.allclose(p.project(v) + p.oProject(v), v)
        Q = Projection.calcProjectionMatrix(A)
        assert np.allclose(Q @ Q, Q, atol=1e-10)  # idempotent


class TestSubspaceMetrics:
    # Values from the reference doctests (metrics.py:43-49,102-109,141-147)
    def test_principal_angles_known(self):
        from pyphysim_tpu.subspace import calc_principal_angles
        A = np.array([[1, 2], [3, 4], [5, 6]], dtype=float)
        B = np.array([[1, 5], [3, 7], [5, -1]], dtype=float)
        angles = calc_principal_angles(A, B)
        assert np.allclose(angles, [0.0, 0.54312217], atol=1e-7)

    def test_chordal_distances_agree(self):
        from pyphysim_tpu.subspace import (
            calc_chordal_distance, calc_chordal_distance_2,
            calc_chordal_distance_from_principal_angles,
            calc_principal_angles)
        A = np.arange(1, 9.0).reshape(4, 2)
        B = np.array([[1.2, 2.1], [2.9, 4.3], [5.2, 6.1], [6.8, 8.1]])
        d1 = calc_chordal_distance(A, B)
        d2 = calc_chordal_distance_2(A, B)
        d3 = calc_chordal_distance_from_principal_angles(
            calc_principal_angles(A, B))
        assert np.isclose(d1, 0.47386786, atol=1e-7)
        assert np.isclose(d2, d1, atol=1e-7)
        assert np.isclose(d3, d1, atol=1e-7)

    def test_carray_matches_host_and_batches(self):
        from pyphysim_tpu.subspace import (calc_chordal_distance,
                                           calc_principal_angles)
        A = rand_c((4, 2), 3)
        B = rand_c((4, 2), 4)
        host = calc_principal_angles(A, B)
        dev = calc_principal_angles(cplx.from_numpy(A), cplx.from_numpy(B))
        assert np.allclose(np.asarray(dev), host, atol=1e-3)
        host_d = calc_chordal_distance(A, B)
        dev_d = calc_chordal_distance(cplx.from_numpy(A), cplx.from_numpy(B))
        assert np.isclose(float(dev_d), host_d, atol=1e-3)
        # batched over a leading axis (the codebook-search shape)
        As = cplx.stack([cplx.from_numpy(A), cplx.from_numpy(B)])
        Bs = cplx.stack([cplx.from_numpy(B), cplx.from_numpy(B)])
        ds = jax.jit(calc_chordal_distance)(As, Bs)
        assert ds.shape == (2,)
        assert np.isclose(float(ds[0]), host_d, atol=1e-3)
        assert np.isclose(float(ds[1]), 0.0, atol=1e-3)


class TestBlockDiagonalizer:
    def test_block_diagonalization(self):
        for method in ("block_diagonalize",
                       "block_diagonalize_no_waterfilling"):
            bd = BlockDiagonalizer(num_users=2, iPu=1.5, noise_var=1e-4)
            H = rand_c((4, 4), 42)
            newH, Ms = getattr(bd, method)(H)
            # off-diagonal blocks are nulled
            assert np.allclose(newH[:2, 2:], 0, atol=1e-5), method
            assert np.allclose(newH[2:, :2], 0, atol=1e-5), method
            # per-BS power constraint: no BS exceeds iPu
            for u in range(2):
                pw = np.linalg.norm(Ms[:, 2 * u:2 * u + 2], "fro") ** 2
                assert pw <= 1.5 + 1e-6, method
            assert np.allclose(newH, H @ Ms, atol=1e-5)

    def test_no_waterfilling_uses_full_power(self):
        bd = BlockDiagonalizer(2, 1.5, 1e-4)
        H = rand_c((4, 4), 3)
        _, Ms = bd.block_diagonalize_no_waterfilling(H)
        for u in range(2):
            pw = np.linalg.norm(Ms[:, 2 * u:2 * u + 2], "fro") ** 2
            assert np.isclose(pw, 1.5, rtol=1e-5)

    def test_receive_filter_recovers(self):
        bd = BlockDiagonalizer(2, 1.0, 1e-4)
        H = rand_c((4, 4), 5)
        newH, Ms = bd.block_diagonalize_no_waterfilling(H)
        W = BlockDiagonalizer.calc_receive_filter(newH)
        x = rand_c((4, 20), 6)
        assert np.allclose(W @ (H @ (Ms @ x)), x, atol=1e-3)

    def test_invalid_rows(self):
        bd = BlockDiagonalizer(3, 1.0, 1e-4)
        with pytest.raises(ValueError):
            bd.block_diagonalize(rand_c((4, 4), 0))


class TestEnhancedAndWhiteningBD:
    def make_channel(self, seed=0):
        mu = MultiUserChannelMatrixExtInt()
        mu.set_channel_seed(seed)
        mu.randomize(2, 2, 2, NtE=1)
        mu.noise_var = 1e-3
        return mu

    def test_no_reduction(self):
        mu = self.make_channel()
        ebd = EnhancedBD(2, 1.0, 1e-3, pe=0.5)
        ebd.set_ext_int_handling_metric(None)
        MsPk, Wk, Ns = ebd.block_diagonalize_no_waterfilling(mu)
        assert len(MsPk) == 2
        assert np.array_equal(Ns, [2, 2])
        # precoders respect power
        for m in MsPk:
            assert np.linalg.norm(m, "fro") ** 2 <= 1.0 + 1e-6

    @pytest.mark.parametrize("metric", ["fixed", "naive"])
    def test_fixed_naive(self, metric):
        mu = self.make_channel(1)
        ebd = EnhancedBD(2, 1.0, 1e-3, pe=0.5)
        ebd.set_ext_int_handling_metric(metric, {"num_streams": 1})
        MsPk, Wk, Ns = ebd.block_diagonalize_no_waterfilling(mu)
        assert np.array_equal(Ns, [1, 1])
        assert MsPk[0].shape == (4, 1)
        assert Wk[0].shape == (1, 2)

    @pytest.mark.parametrize("metric,extra", [
        ("capacity", None),
        ("effective_throughput", "modpack"),
    ])
    def test_decide_metrics(self, metric, extra):
        from pyphysim_tpu.modulators import QAM
        mu = self.make_channel(2)
        ebd = EnhancedBD(2, 1.0, 1e-3, pe=10.0)
        kwargs = ({"modulator": QAM(16), "packet_length": 60}
                  if extra else None)
        ebd.set_ext_int_handling_metric(metric, kwargs)
        MsPk, Wk, Ns = ebd.block_diagonalize_no_waterfilling(mu)
        assert all(1 <= n <= 2 for n in Ns)

    def test_metric_validation(self):
        ebd = EnhancedBD(2, 1.0, 1e-3, pe=0.5)
        with pytest.raises(AttributeError):
            ebd.set_ext_int_handling_metric("bogus")
        with pytest.raises(AttributeError):
            ebd.set_ext_int_handling_metric("naive")
        with pytest.raises(AttributeError):
            ebd.set_ext_int_handling_metric("effective_throughput")
        assert ebd.metric_name == "None"

    def test_whitening_bd(self):
        mu = self.make_channel(3)
        wbd = WhiteningBD(2, 1.0, 1e-3, pe=0.5)
        Ms_all, Wk_all, Ns = wbd.block_diagonalize_no_waterfilling(mu)
        assert len(Ms_all) == 2
        assert np.array_equal(Ns, [2, 2])
        # combined precoder block diagonalizes the WHITENED channel:
        # the cross-user part of W_k H M_j must be ~0
        H = mu.big_H_no_ext_int.to_numpy()
        cross = Wk_all[0] @ H[:2, :] @ Ms_all[1]
        same = Wk_all[0] @ H[:2, :] @ Ms_all[0]
        assert np.linalg.norm(cross) < 1e-4 * np.linalg.norm(same)


class TestBatchedBlockDiagonalization:
    """Device-batched BD cross-checked against the host BlockDiagonalizer
    on every invariant the SVD basis freedom preserves."""

    def _channels(self, batch=4, K=3, nr_u=2, nt_tot=6, seed=11):
        rs = np.random.RandomState(seed)
        return np.stack(
            [randn_c_RS(rs, K * nr_u, nt_tot) for _ in range(batch)])

    def test_normalized_matches_host(self):
        import functools
        import jax
        from pyphysim_tpu.comm import (BlockDiagonalizer,
                                       bd_precoders_batched,
                                       bd_receive_filter_batched)
        from pyphysim_tpu.ops import cplx
        K, nr_u, iPu, nv = 3, 2, 1.5, 0.3
        Hs = self._channels()
        f = jax.jit(functools.partial(bd_precoders_batched, num_users=K,
                                      iPu=iPu, noise_var=nv,
                                      mode="normalized"))
        newH, Ms, _ = f(cplx.from_numpy(Hs))
        newH_n, Ms_n = newH.to_numpy(), Ms.to_numpy()
        host = BlockDiagonalizer(K, iPu, nv)
        for b in range(Hs.shape[0]):
            nh_host, _ = host.block_diagonalize(Hs[b])
            for i in range(K):
                for j in range(K):
                    blk = newH_n[b, i * nr_u:(i + 1) * nr_u,
                                 j * 2:(j + 1) * 2]
                    if i != j:  # interference nulled
                        assert np.abs(blk).max() < 1e-4
                    else:  # same effective per-user channel as the host
                        s_dev = np.linalg.svd(blk, compute_uv=False)
                        s_host = np.linalg.svd(
                            nh_host[i * nr_u:(i + 1) * nr_u,
                                    i * 2:(i + 1) * 2], compute_uv=False)
                        assert np.allclose(np.sort(s_dev), np.sort(s_host),
                                           atol=2e-3)
            # power constraint: most-loaded BS transmits exactly iPu
            norms = [np.linalg.norm(Ms_n[b][:, k * 2:(k + 1) * 2], "fro")
                     for k in range(K)]
            assert abs(max(norms) - np.sqrt(iPu)) < 1e-4

        # ZF filter inverts every stream that received power (a stream
        # clipped to zero by water-filling is correctly left at zero)
        W = bd_receive_filter_batched(newH)
        eye = cplx.matmul(W, newH).to_numpy()
        powered = np.sum(np.abs(Ms_n) ** 2, axis=1) > 1e-6  # (batch, 6)
        for b in range(Hs.shape[0]):
            idx = np.where(powered[b])[0]
            assert np.allclose(eye[b][np.ix_(idx, idx)],
                               np.eye(idx.size), atol=1e-3)

    def test_no_waterfilling_matches_host(self):
        import functools
        import jax
        from pyphysim_tpu.comm import (BlockDiagonalizer,
                                       bd_precoders_batched)
        from pyphysim_tpu.ops import cplx
        K, nr_u, iPu, nv = 3, 2, 1.5, 0.3
        Hs = self._channels(seed=12)
        f = jax.jit(functools.partial(bd_precoders_batched, num_users=K,
                                      iPu=iPu, noise_var=nv, mode="none"))
        newH, Ms, _ = f(cplx.from_numpy(Hs))
        host = BlockDiagonalizer(K, iPu, nv)
        for b in range(Hs.shape[0]):
            nh_host, _ = host.block_diagonalize_no_waterfilling(Hs[b])
            for k in range(K):
                # every BS transmits exactly iPu
                n_dev = np.linalg.norm(
                    Ms.to_numpy()[b][:, k * 2:(k + 1) * 2], "fro")
                assert abs(n_dev - np.sqrt(iPu)) < 1e-4
                s_dev = np.linalg.svd(
                    newH.to_numpy()[b, k * nr_u:(k + 1) * nr_u,
                                    k * 2:(k + 1) * 2], compute_uv=False)
                s_host = np.linalg.svd(
                    nh_host[k * nr_u:(k + 1) * nr_u, k * 2:(k + 1) * 2],
                    compute_uv=False)
                assert np.allclose(np.sort(s_dev), np.sort(s_host),
                                   atol=2e-3)

    def test_global_waterfilling_power_allocation(self):
        """Global mode reproduces the host's water-filled stream powers."""
        import functools
        import jax
        from pyphysim_tpu.comm import BlockDiagonalizer, bd_precoders_batched
        from pyphysim_tpu.comm import waterfilling
        from pyphysim_tpu.ops import cplx
        K, iPu, nv = 3, 1.5, 0.3
        Hs = self._channels(batch=2, seed=13)
        f = jax.jit(functools.partial(bd_precoders_batched, num_users=K,
                                      iPu=iPu, noise_var=nv, mode="global"))
        _, Ms, Sigma = f(cplx.from_numpy(Hs))
        host = BlockDiagonalizer(K, iPu, nv)
        for b in range(Hs.shape[0]):
            _, sigma_host = host._calc_BD_matrix_no_power_scaling(Hs[b])
            p_host = waterfilling.doWF(np.sort(sigma_host)[::-1] ** 2,
                                       K * iPu, nv)[0]
            # column power of Ms = water-filled power per stream
            p_dev = np.sum(np.abs(Ms.to_numpy()[b]) ** 2, axis=0)
            assert np.allclose(np.sort(p_dev)[::-1], np.sort(p_host)[::-1],
                               atol=2e-3)
            # Sigma matches the host's unscaled singular values
            assert np.allclose(np.sort(Sigma[b]), np.sort(sigma_host),
                               atol=2e-3)

    def test_vmap_composes(self):
        import jax
        from pyphysim_tpu.comm import bd_precoders_batched
        from pyphysim_tpu.ops import cplx
        Hs = self._channels(batch=3, seed=14)
        single = lambda h: bd_precoders_batched(h, 3, 1.0, 0.1, "none")[0]
        batched = jax.vmap(single)(cplx.from_numpy(Hs))
        for b in range(3):
            one = single(cplx.from_numpy(Hs[b]))
            assert np.allclose(batched.to_numpy()[b], one.to_numpy(),
                               atol=1e-5)


class TestVectorizedMuChannel:
    """VERDICT round-1 item 2: the K^2 Python object grid was replaced by
    ONE vmapped TdlChannel over stacked link states. These tests pin the
    vmapped implementation to an explicit per-link loop on the same keys,
    prove the single trace, and run a K=3 MuMimo OFDM interference sweep
    through the runner's batch path."""

    @staticmethod
    def _per_link_reference(mu, key, signal, freq=None):
        """The old object-grid semantics, reconstructed with the per-link
        SuChannel objects and the SAME key split init_state uses."""
        R, T = mu.num_rx_users, mu.num_tx_users
        keys = jax.random.split(key, R * T)
        out = []
        for r in range(R):
            acc = None
            for t in range(T):
                ch = mu._su_channels[r][t]
                state = ch.init_state(keys[r * T + t])
                if freq is None:
                    o, _, _ = ch.corrupt_data(state, signal[t])
                else:
                    o, _, _ = ch.corrupt_data_in_freq_domain(
                        state, signal[t], freq[0], freq[1])
                acc = o if acc is None else acc + o
            out.append(acc)
        return out

    def test_matches_per_link_loop_time_domain(self):
        from pyphysim_tpu.channels import JakesSampleGenerator
        from pyphysim_tpu.channels.fading import COST259_TUx
        jakes = JakesSampleGenerator(Fd=30.0, Ts=3.25e-8, L=16)
        mu = MuChannel(N=3, fading_generator=jakes,
                       channel_profile=COST259_TUx)
        pl = np.array([[1.0, 0.1, 0.1],
                       [0.2, 0.9, 0.05],
                       [0.3, 0.1, 0.8]])
        mu.set_pathloss(pl)
        key = jax.random.PRNGKey(42)
        x = randn_c(jax.random.PRNGKey(7), 3, 64)
        states = mu.init_state(key)
        out, irs, _ = mu.corrupt_data(states, x)
        expected = self._per_link_reference(mu, key, x)
        for r in range(3):
            assert np.allclose(out[r].to_numpy(), expected[r].to_numpy(),
                               atol=1e-4), r
        # stacked per-link impulse responses are sliceable per link
        ir01 = irs.tap_values_sparse[:, 1]
        assert ir01.shape[-1] == 64

    def test_matches_per_link_loop_freq_domain_mimo(self):
        mu = MuMimoChannel(N=2, num_rx_antennas=2, num_tx_antennas=2)
        key = jax.random.PRNGKey(5)
        fft_size = 16
        x = randn_c(jax.random.PRNGKey(9), 2, 2, 32)  # 2 blocks of 16
        states = mu.init_state(key)
        out, _, _ = mu.corrupt_data_in_freq_domain(
            states, [x[0], x[1]], fft_size, None)
        expected = self._per_link_reference(mu, key, [x[0], x[1]],
                                            freq=(fft_size, None))
        for r in range(2):
            assert np.allclose(out[r].to_numpy(), expected[r].to_numpy(),
                               atol=1e-4), r

    def test_single_trace_instead_of_k_squared(self):
        mu = MuChannel(N=3)
        base = mu._base_tdl()
        calls = []
        orig = base._corrupt_data_impl

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        base._corrupt_data_impl = spy
        try:
            x = randn_c(jax.random.PRNGKey(1), 3, 16)
            mu.corrupt_data(mu.init_state(jax.random.PRNGKey(0)), x)
        finally:
            base._corrupt_data_impl = orig
        # one vmapped trace covers all 9 links
        assert len(calls) == 1

    def test_k3_mumimo_ofdm_sweep_through_batch_runner(self):
        """K=3 MuMimo OFDM interference sweep on the runner's batch path:
        desired-link one-tap equalization with two interferers."""
        from pyphysim_tpu.modulators import QPSK, OFDM
        from pyphysim_tpu.simulations import Result, SimulationRunner
        from pyphysim_tpu.utils.conversion import dB2Linear

        K, fft_size = 3, 16
        mod = QPSK()
        n_sym = fft_size * 2  # 2 OFDM blocks, all carriers used

        class MuOfdmRunner(SimulationRunner):
            def __init__(self):
                super().__init__(read_command_line_args=False)
                self.params.add("SNR", np.array([30.0, 50.0]))
                self.params.set_unpack_parameter("SNR")
                self.rep_max = 8
                self.update_progress_function_style = None
                self.batch_result_types = {"ser": Result.RATIOTYPE}
                self.mu = MuMimoChannel(N=K, num_rx_antennas=1,
                                        num_tx_antennas=1)

            def _gen_simulation_kernel(self, p):
                snr = dB2Linear(float(p["SNR"]))
                noise_scale = float(np.sqrt(1.0 / snr))
                mu = self.mu
                ofdm = OFDM(fft_size, 0, fft_size)

                def kernel(key):
                    kd, kc, kn = jax.random.split(key, 3)
                    data = jax.random.randint(kd, (K, n_sym), 0, 4)
                    tx = jax.vmap(
                        lambda d: ofdm.modulate(mod.modulate(d)))(data)
                    states = mu.init_state(kc)
                    # per-user MIMO signals: (Nt=1, n)
                    rx, irs, _ = mu.corrupt_data_in_freq_domain(
                        states, [tx[k][None, :] for k in range(K)],
                        fft_size, None)
                    # receiver 0: equalize the desired (0,0) link's
                    # frequency response; links 1, 2 remain interference
                    y = rx[0][0] + randn_c(kn, n_sym) * noise_scale
                    # stacked IR: (taps, R*T, Nr, Nt, blocks) -> link (0,0)
                    tv = irs.tap_values_sparse[:, 0, 0, 0, :]
                    from pyphysim_tpu.channels.fading import \
                        TdlImpulseResponse
                    h = TdlImpulseResponse(
                        tv, irs.channel_profile).get_freq_response(
                        fft_size)  # (blocks, fft)
                    y_eq = (y.reshape(2, fft_size) / h).reshape(-1)
                    errs = jnp.sum(mod.demodulate(y_eq) != data[0])
                    return {"ser": (errs, jnp.asarray(n_sym))}

                return kernel

        runner = MuOfdmRunner()
        runner.simulate()
        ser = np.array(runner.results.get_result_values_list("ser"))
        # interference-limited: high SER even at 50 dB, and not degenerate
        assert np.all(ser > 0.05) and np.all(ser < 0.95), ser


class TestBatchedExtIntBD:
    """Device ext-int BD family (comm/batched.py whitening_bd_batched /
    enhanced_bd_batched) cross-checked against the host solvers
    per-realization (VERDICT round-2 item 6). Both sides use the
    canonical per-column phase convention, so outputs agree element-wise
    (f32-relative; ill-conditioned pinvs dominate the error)."""

    K, PE, IPU, NV = 3, 0.1, 1.0, 0.01

    def _setup(self, seed):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched  # noqa
        mu = MultiUserChannelMatrixExtInt()
        mu.randomize(np.full(self.K, 2), np.full(self.K, 2), self.K, 1,
                     key=jax.random.PRNGKey(seed))
        mu.noise_var = self.NV
        Hn = mu.big_H_no_ext_int
        Hn = Hn.to_numpy() if hasattr(Hn, "to_numpy") else np.asarray(Hn)
        Rl = mu.calc_cov_matrix_extint_plus_noise(self.PE)
        Rn = np.stack([
            r.to_numpy() if hasattr(r, "to_numpy") else np.asarray(r)
            for r in Rl])
        H = cplx.from_numpy(Hn.astype(np.complex64))
        R = cplx.from_numpy(Rn.astype(np.complex64))
        return mu, H, R, Hn, Rn

    def _cases(self):
        from pyphysim_tpu.modulators import PSK
        mod = PSK(4)
        return [
            (None, None, {}),
            ("naive", {"num_streams": 1}, {"num_streams": 1}),
            ("fixed", {"num_streams": 1}, {"num_streams": 1}),
            ("capacity", None, {}),
            ("effective_throughput",
             {"modulator": mod, "packet_length": 60},
             {"modulator": mod, "packet_length": 60}),
        ]

    @pytest.mark.parametrize("case_idx", range(5))
    def test_enhanced_bd_matches_host_all_metrics(self, case_idx):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        metric, extra, kw = self._cases()[case_idx]
        for seed in (5, 9):
            mu, H, R, Hn, Rn = self._setup(seed)
            host = EnhancedBD(self.K, self.IPU, self.NV, self.PE)
            host.set_ext_int_handling_metric(metric, extra)
            MsPk_h, Wk_h, Ns_h = \
                host.block_diagonalize_no_waterfilling(mu)
            MsPk_d, Wk_d, Ns_d, sinr_d, valid = enhanced_bd_batched(
                H, R, self.K, self.IPU, metric=metric, **kw)
            assert bool(np.asarray(valid))
            np.testing.assert_array_equal(
                np.asarray(Ns_d), np.asarray(Ns_h, np.float32)), \
                (seed, metric)
            for k in range(self.K):
                ns = int(Ns_h[k])
                dm = MsPk_d.to_numpy()[k][:, :ns]
                dw = Wk_d.to_numpy()[k][:ns, :]
                scale_m = max(1.0, np.abs(MsPk_h[k]).max())
                scale_w = max(1.0, np.abs(Wk_h[k]).max())
                assert np.abs(dm - MsPk_h[k]).max() / scale_m < 2e-2, \
                    (seed, metric, k)
                assert np.abs(dw - Wk_h[k]).max() / scale_w < 2e-2, \
                    (seed, metric, k)
                # padded (dropped) streams are exactly zero
                assert np.allclose(MsPk_d.to_numpy()[k][:, ns:], 0)
                assert np.allclose(Wk_d.to_numpy()[k][ns:, :], 0)

    def test_enhanced_bd_sinrs_match_host_formula(self):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        mu, H, R, Hn, Rn = self._setup(7)
        MsPk_d, Wk_d, Ns_d, sinr_d, valid = enhanced_bd_batched(
            H, R, self.K, self.IPU, metric="capacity")
        for k in range(self.K):
            ns = int(np.asarray(Ns_d)[k])
            Heq_red = Hn[2 * k:2 * k + 2] @ MsPk_d.to_numpy()[k][:, :ns]
            want = EnhancedBD._calc_linear_SINRs(
                Heq_red, Wk_d.to_numpy()[k][:ns, :], Rn[k])
            got = np.asarray(sinr_d)[k][:ns]
            np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_enhanced_bd_power_constraint(self):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        mu, H, R, _, _ = self._setup(11)
        for metric, _, kw in self._cases():
            MsPk_d, _, _, _, _ = enhanced_bd_batched(
                H, R, self.K, self.IPU, metric=metric, **kw)
            Mn = MsPk_d.to_numpy()
            for k in range(self.K):
                assert np.isclose(np.linalg.norm(Mn[k]) ** 2, self.IPU,
                                  rtol=1e-3), (metric, k)

    def test_enhanced_bd_vmap_matches_single(self):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        _, H1, R1, _, _ = self._setup(13)
        _, H2, R2, _, _ = self._setup(14)
        Hb = cplx.CArray(np.stack([H1.re, H2.re]),
                         np.stack([H1.im, H2.im]))
        Rb = cplx.CArray(np.stack([R1.re, R2.re]),
                         np.stack([R1.im, R2.im]))
        f = jax.jit(jax.vmap(lambda h, r: enhanced_bd_batched(
            h, r, self.K, self.IPU, metric="capacity")))
        Mb, Wb, Nsb, Sb, Vb = f(Hb, Rb)
        for i, (H, R) in enumerate(((H1, R1), (H2, R2))):
            M1, W1, Ns1, S1, V1 = enhanced_bd_batched(
                H, R, self.K, self.IPU, metric="capacity")
            np.testing.assert_array_equal(np.asarray(Nsb)[i],
                                          np.asarray(Ns1))
            np.testing.assert_allclose(np.asarray(Sb)[i],
                                       np.asarray(S1), rtol=1e-4,
                                       atol=1e-5)

    def test_degenerate_draw_flagged_invalid(self):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        _, H, R, Hn, Rn = self._setup(15)
        # make user 1's rows equal user 2's: tilde_H for user 0 is rank
        # deficient -> the static null-space shapes are wrong for this
        # draw and the kernel must flag it rather than return garbage
        Hbad = Hn.copy()
        Hbad[2:4, :] = Hbad[4:6, :]
        Hb = cplx.from_numpy(Hbad.astype(np.complex64))
        _, _, _, _, valid = enhanced_bd_batched(
            Hb, R, self.K, self.IPU, metric="capacity")
        assert not bool(np.asarray(valid))

    def test_whitening_bd_matches_host_structure(self):
        from pyphysim_tpu.comm.batched import whitening_bd_batched
        for seed in (5, 8):
            mu, H, R, Hn, Rn = self._setup(seed)
            host = WhiteningBD(self.K, self.IPU, self.NV, self.PE)
            Ms_h, Wk_h, Ns_h = host.block_diagonalize_no_waterfilling(mu)
            Ms_d, Wk_d, valid = whitening_bd_batched(
                H, R, self.K, self.IPU)
            assert bool(np.asarray(valid))
            Mdn, Wdn = Ms_d.to_numpy(), Wk_d.to_numpy()
            for k in range(self.K):
                # per-BS power constraint (both implementations)
                assert np.isclose(np.linalg.norm(Mdn[k]) ** 2, self.IPU,
                                  rtol=1e-3)
                assert np.isclose(np.linalg.norm(Ms_h[k]) ** 2, self.IPU,
                                  rtol=1e-3)
                # composite-filter invariant: W_k H_k Ms_j = delta_kj I
                for j in range(self.K):
                    got = Wdn[k] @ Hn[2 * k:2 * k + 2] @ Mdn[j]
                    want_h = Wk_h[k] @ Hn[2 * k:2 * k + 2] @ Ms_h[j]
                    target = np.eye(2) if j == k else np.zeros((2, 2))
                    assert np.abs(got - target).max() < 1e-3, (seed, k, j)
                    assert np.abs(want_h - target).max() < 1e-3, \
                        (seed, k, j)


class TestBatchedExtIntBDNonSquare:
    """Non-square geometries (Nt_u > Nr_u) for the device ext-int BD
    family (VERDICT round-3 item 4): every user still keeps Nr_u
    streams, chosen as the best stream-aligned directions in the FULL
    (now larger) null space — host and device agree per-realization."""

    PE, IPU, NV = 0.1, 1.0, 0.01

    GEOMETRIES = [(3, 2, 3),   # K=3, Nr_u=2, Nt_u=3 (the VERDICT case)
                  (2, 2, 4)]   # K=2, Nr_u=2, Nt_u=4

    def _setup(self, K, nr, nt, seed):
        mu = MultiUserChannelMatrixExtInt()
        mu.randomize(np.full(K, nr), np.full(K, nt), K, 1,
                     key=jax.random.PRNGKey(seed))
        mu.noise_var = self.NV
        Hn = mu.big_H_no_ext_int
        Hn = Hn.to_numpy() if hasattr(Hn, "to_numpy") else np.asarray(Hn)
        Rl = mu.calc_cov_matrix_extint_plus_noise(self.PE)
        Rn = np.stack([
            r.to_numpy() if hasattr(r, "to_numpy") else np.asarray(r)
            for r in Rl])
        H = cplx.from_numpy(Hn.astype(np.complex64))
        R = cplx.from_numpy(Rn.astype(np.complex64))
        return mu, H, R, Hn, Rn

    def _metric_cases(self):
        from pyphysim_tpu.modulators import PSK
        mod = PSK(4)
        return [
            (None, None, {}),
            ("naive", {"num_streams": 1}, {"num_streams": 1}),
            ("fixed", {"num_streams": 1}, {"num_streams": 1}),
            ("capacity", None, {}),
            ("effective_throughput",
             {"modulator": mod, "packet_length": 60},
             {"modulator": mod, "packet_length": 60}),
        ]

    @pytest.mark.parametrize("K,nr,nt", GEOMETRIES)
    @pytest.mark.parametrize("case_idx", range(5))
    def test_enhanced_bd_matches_host(self, K, nr, nt, case_idx):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        metric, extra, kw = self._metric_cases()[case_idx]
        mu, H, R, Hn, Rn = self._setup(K, nr, nt, seed=21 + case_idx)
        host = EnhancedBD(K, self.IPU, self.NV, self.PE)
        host.set_ext_int_handling_metric(metric, extra)
        MsPk_h, Wk_h, Ns_h = host.block_diagonalize_no_waterfilling(mu)
        MsPk_d, Wk_d, Ns_d, sinr_d, valid = enhanced_bd_batched(
            H, R, K, self.IPU, metric=metric, **kw)
        assert bool(np.asarray(valid))
        # every user keeps at most Nr_u streams even though Nt_u > Nr_u
        assert MsPk_d.shape[-1] == nr
        np.testing.assert_array_equal(
            np.asarray(Ns_d), np.asarray(Ns_h, np.float32))
        for k in range(K):
            ns = int(Ns_h[k])
            dm = MsPk_d.to_numpy()[k][:, :ns]
            dw = Wk_d.to_numpy()[k][:ns, :]
            scale_m = max(1.0, np.abs(MsPk_h[k]).max())
            scale_w = max(1.0, np.abs(Wk_h[k]).max())
            assert np.abs(dm - MsPk_h[k]).max() / scale_m < 2e-2, \
                (metric, k)
            assert np.abs(dw - Wk_h[k]).max() / scale_w < 2e-2, \
                (metric, k)
            assert np.allclose(MsPk_d.to_numpy()[k][:, ns:], 0)
            assert np.allclose(Wk_d.to_numpy()[k][ns:, :], 0)

    @pytest.mark.parametrize("K,nr,nt", GEOMETRIES)
    def test_enhanced_bd_block_diagonalizes(self, K, nr, nt):
        """W_k H_k MsPk_j ~ delta_kj I on the kept streams: the larger
        null space still nulls the cross-user blocks exactly."""
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        mu, H, R, Hn, _ = self._setup(K, nr, nt, seed=31)
        MsPk_d, Wk_d, Ns_d, _, valid = enhanced_bd_batched(
            H, R, K, self.IPU, metric=None)
        assert bool(np.asarray(valid))
        Mdn, Wdn = MsPk_d.to_numpy(), Wk_d.to_numpy()
        for k in range(K):
            for j in range(K):
                got = Wdn[k] @ Hn[nr * k:nr * (k + 1)] @ Mdn[j]
                target = np.eye(nr) if j == k else np.zeros((nr, nr))
                assert np.abs(got - target).max() < 1e-3, (k, j)

    @pytest.mark.parametrize("K,nr,nt", GEOMETRIES)
    def test_whitening_bd_matches_host_structure(self, K, nr, nt):
        from pyphysim_tpu.comm.batched import whitening_bd_batched
        mu, H, R, Hn, _ = self._setup(K, nr, nt, seed=41)
        host = WhiteningBD(K, self.IPU, self.NV, self.PE)
        Ms_h, Wk_h, Ns_h = host.block_diagonalize_no_waterfilling(mu)
        assert list(Ns_h) == [nr] * K  # widths, not Nt_u
        Ms_d, Wk_d, valid = whitening_bd_batched(H, R, K, self.IPU)
        assert bool(np.asarray(valid))
        Mdn, Wdn = Ms_d.to_numpy(), Wk_d.to_numpy()
        for k in range(K):
            assert np.isclose(np.linalg.norm(Mdn[k]) ** 2, self.IPU,
                              rtol=1e-3)
            assert np.isclose(np.linalg.norm(Ms_h[k]) ** 2, self.IPU,
                              rtol=1e-3)
            for j in range(K):
                got = Wdn[k] @ Hn[nr * k:nr * (k + 1)] @ Mdn[j]
                want_h = Wk_h[k] @ Hn[nr * k:nr * (k + 1)] @ Ms_h[j]
                target = np.eye(nr) if j == k else np.zeros((nr, nr))
                assert np.abs(got - target).max() < 1e-3, (k, j)
                assert np.abs(want_h - target).max() < 1e-3, (k, j)

    def test_too_few_tx_antennas_raises(self):
        from pyphysim_tpu.comm.batched import enhanced_bd_batched
        _, H, R, _, _ = self._setup(3, 3, 2, seed=51)  # nS = 0 < Nr_u
        with pytest.raises(ValueError, match="Nt_total"):
            enhanced_bd_batched(H, R, 3, self.IPU, metric="capacity")

    def test_bd_precoders_non_square_capacity_sane(self):
        """bd_precoders_batched with Nt_u > Nr_u: the extra transmit
        dimensions RAISE the per-user effective gains vs square (the
        device route picks the best directions in the larger null
        space)."""
        from pyphysim_tpu.comm import bd_precoders_batched
        key = jax.random.PRNGKey(3)
        Hsq = randn_c(key, 64, 6, 6)       # K=3, square
        Htall = randn_c(key, 64, 6, 9)     # K=3, Nt_u=3
        _, _, s_sq = bd_precoders_batched(Hsq, 3, 1.0, 0.0, "none")
        _, _, s_tall = bd_precoders_batched(Htall, 3, 1.0, 0.0, "none")
        assert s_tall.shape == s_sq.shape
        assert float(jnp.mean(s_tall)) > float(jnp.mean(s_sq))


class TestBDRaggedAndWideGeometries:
    """Round-4 review regressions: per-user stream widths can be RAGGED
    (rank-deficient draws) and the device/host pair must agree on the
    stream count in WIDE geometries (nS < Nr_u)."""

    def test_host_ragged_widths_power_normalized(self):
        """K=2, Nr_u=3, Nt_total=5 with user 1's interfering rows made
        rank-deficient: widths become ragged and BOTH users' precoder
        blocks must still carry exactly iPu of power (the old uniform
        total//K split left a column uninitialized)."""
        rs = np.random.RandomState(3)
        H = randn_c_RS(rs, 6, 5)
        H[5] = H[4]  # user 0's tilde_H rank drops to 2: null_dim 3 vs 2
        bd = BlockDiagonalizer(2, iPu=1.0, noise_var=0.01)
        newH, Ms = bd.block_diagonalize_no_waterfilling(H)
        widths = list(bd._last_stream_widths)
        assert sum(widths) == Ms.shape[1]
        assert widths == [3, 2], widths
        col = 0
        for w in widths:
            blk = Ms[:, col:col + w]
            col += w
            assert np.isclose(np.linalg.norm(blk, "fro") ** 2, 1.0,
                              rtol=1e-6)
        # and the channel is still block-diagonalized: cross blocks ~ 0
        cross = newH[:3, widths[0]:]
        assert np.abs(cross).max() < 1e-6

    def test_host_ragged_widths_normalized_wf_grouping(self):
        """The normalized water-filling per-BS norm must group by the
        ACTUAL widths: no user block may exceed iPu."""
        rs = np.random.RandomState(5)
        H = randn_c_RS(rs, 6, 5)
        H[5] = H[4]
        bd = BlockDiagonalizer(2, iPu=1.0, noise_var=0.01)
        newH, Ms = bd.block_diagonalize(H)
        widths = list(bd._last_stream_widths)
        col = 0
        for w in widths:
            blk = Ms[:, col:col + w]
            col += w
            assert np.linalg.norm(blk, "fro") ** 2 <= 1.0 + 1e-6

    def test_wide_geometry_device_matches_host(self):
        """K=2, Nr_u=3, Nt_u=2 (Nt_total=4, nS=1 < Nr_u): both sides
        keep min(Nr_u, nS) = 1 stream per user with the same effective
        singular value."""
        from pyphysim_tpu.comm import bd_precoders_batched
        rs = np.random.RandomState(7)
        Hn = randn_c_RS(rs, 6, 4)
        host = BlockDiagonalizer(2, iPu=1.0, noise_var=0.01)
        Ms_bad_h, Sigma_h = host._calc_BD_matrix_no_power_scaling(Hn)
        assert list(host._last_stream_widths) == [1, 1]
        H = cplx.from_numpy(Hn.astype(np.complex64))
        newH, Ms, Sigma_d = bd_precoders_batched(H, 2, 1.0, 0.01, "none")
        assert Ms.shape[-1] == 2  # one stream per user
        np.testing.assert_allclose(np.sort(np.asarray(Sigma_d)),
                                   np.sort(np.asarray(Sigma_h)),
                                   rtol=2e-3)
        # equal per-BS power and block diagonalization hold
        Mn = Ms.to_numpy()
        for k in range(2):
            assert np.isclose(np.linalg.norm(Mn[:, k:k + 1]) ** 2, 1.0,
                              rtol=1e-3)
        nHn = newH.to_numpy()
        assert np.abs(nHn[:3, 1:]).max() < 1e-4
        assert np.abs(nHn[3:, :1]).max() < 1e-4
