"""Tests for classic-AMG analysis helpers and union-find."""

import numpy as np

from mlamg_tpu.mg.helpers import (
    ideal_interpolation,
    relax,
    twolevel,
    det_conv_factor,
    det_conv_factor_optimal_omega,
    grid_from_coarsening_factor,
    normalize_mat,
    gen_1d_poisson_fd,
    gen_1d_poisson_fd_vc,
)
from mlamg_tpu.graph.disjoint_sets import DisjointSets


class TestHelpers:
    def test_ideal_interpolation_exact_coarse_solve(self, rng):
        # with ideal interpolation, one exact two-level cycle on the C/F
        # hierarchy kills the error at C points and A-harmonic F error
        A = gen_1d_poisson_fd(15)
        C, F = grid_from_coarsening_factor(15, 2)
        P = ideal_interpolation(A, C)
        assert P.shape == (15, C.sum())
        # P restricted to C rows is identity
        np.testing.assert_allclose(P[np.where(C)[0]], np.eye(C.sum()), atol=1e-12)
        # two-level convergence with ideal P is fast
        x = np.zeros(15)
        u_ref = np.zeros(15)
        u0 = rng.randn(15)
        conv = det_conv_factor(A, C, x, u0, u_ref, omega=0.666)
        assert conv < 0.3

    def test_optimal_omega(self, rng):
        A = gen_1d_poisson_fd(15)
        C, F = grid_from_coarsening_factor(15, 2)
        u0 = rng.randn(15)
        conv, omega = det_conv_factor_optimal_omega(A, C, np.zeros(15), u0, np.zeros(15))
        assert 0 < omega < 1
        assert conv <= det_conv_factor(A, C, np.zeros(15), u0, np.zeros(15), 0.666) + 1e-9

    def test_relax_formula(self, rng):
        A = gen_1d_poisson_fd(10)
        b = rng.randn(10)
        u = relax(A, np.zeros(10), b, nu=1, omega=0.5)
        np.testing.assert_allclose(u, 0.5 * b / np.diag(A), atol=1e-12)

    def test_vc_poisson_matches_constant(self):
        A1 = gen_1d_poisson_fd(8)
        A2 = gen_1d_poisson_fd_vc(8, np.ones(9))
        np.testing.assert_allclose(A1, A2, atol=1e-9)

    def test_normalize_mat(self, rng):
        import scipy.sparse as sp

        A = sp.random(20, 20, density=0.3, format="csr", random_state=rng)
        N = normalize_mat(A)
        assert N.data.min() >= 0.1 - 1e-12
        assert N.data.max() <= 1.0 + 1e-12


class TestDisjointSets:
    def test_union_find(self):
        ds = DisjointSets(6)
        assert ds.num_sets == 6
        ds.union(0, 1)
        ds.union(2, 3)
        ds.union(1, 2)
        assert ds.num_sets == 3
        assert ds.connected(0, 3)
        assert not ds.connected(0, 4)
        labels = ds.labels()
        assert labels[0] == labels[1] == labels[2] == labels[3]
        assert len(set(labels)) == 3
