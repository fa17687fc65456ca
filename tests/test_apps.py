"""Tests for the example applications (parity: the reference ships its
apps untested; here the device-side app kernels are cross-checked against
host math)."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyphysim_tpu.ops import cplx
from pyphysim_tpu.utils.misc import randn_c_RS


class TestFindCodebook:
    def test_device_min_dist_matches_host(self):
        from apps.find_codebook import CodebookFinder, min_chordal_dist_sq
        rs = np.random.RandomState(7)
        K, Nt, Ns = 6, 4, 2
        cb = np.stack([randn_c_RS(rs, Nt, Ns) for _ in range(K)])
        cb /= np.linalg.norm(cb, axis=(-2, -1), keepdims=True)
        host_d, _ = CodebookFinder.calc_min_chordal_dist(cb)
        dev_d2 = jax.jit(min_chordal_dist_sq)(cplx.from_numpy(cb))
        assert np.isclose(float(np.sqrt(dev_d2)), host_d, atol=1e-3)

    def test_finder_improves_and_respects_types(self):
        from apps.find_codebook import (COMPLEX_QEGT, REAL, CodebookFinder)
        cb = CodebookFinder(3, 1, 8, prng_seed=1, batch=32)
        cb.find_codebook(64)
        first = cb.min_dist
        assert 0.0 < first <= 1.0 + 1e-6
        cb.find_codebook(256)
        assert cb.min_dist >= first  # best-so-far is monotone
        assert cb.codebook.shape == (8, 3, 1)

        real = CodebookFinder(3, 1, 4, REAL, prng_seed=2, batch=16)
        real.find_codebook(16)
        assert np.allclose(real.codebook.imag, 0)

        qegt = CodebookFinder(3, 1, 4, COMPLEX_QEGT, prng_seed=3, batch=16)
        qegt.find_codebook(16)
        assert np.allclose(np.abs(qegt.codebook), 1.0, atol=1e-5)
