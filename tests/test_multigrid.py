"""Multigrid tests: smoothers, SA interpolation, two-level and V-cycle
convergence, Krylov solvers.  Oracles are small in-test numpy
implementations of the published algorithms (pyamg is not available)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import CSR
from mlamg_tpu.mg import (
    jacobi,
    l1_jacobi,
    chebyshev,
    multicolor_gauss_seidel,
    greedy_coloring,
    sa_interpolation_dense,
    smoothed_aggregation,
    twolevel_solve,
    build_hierarchy,
    vcycle_solve,
    pcg,
    fgmres,
)
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.graph.strength import power_iteration_lmax


def poisson1d(n):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def grouped_agg(n, size):
    """Aggregate id vector grouping consecutive nodes."""
    return np.arange(n) // size


def numpy_twolevel_jacobi(A, P, b, x, *, omega=0.666, pre=1, post=1,
                          res_tol=1e-10, max_iter=500):
    """Independent numpy oracle of the two-level Jacobi AMG cycle with the
    reference's convergence-factor readout semantics."""
    A = sp.csr_matrix(A)
    Dinv = 1.0 / A.diagonal()
    AH = np.asarray((P.T @ A @ P).todense() if sp.issparse(P) else P.T @ (A @ P))
    lu = spla.splu(sp.csc_matrix(AH))
    x = x.copy()
    err = []
    for _ in range(max_iter):
        for _ in range(pre):
            x = x + omega * Dinv * (b - A @ x)
        r = b - A @ x
        e = lu.solve(P.T @ r)
        x = x + P @ e
        for _ in range(post):
            x = x + omega * Dinv * (b - A @ x)
        e_n = np.linalg.norm(b - A @ x)
        err.append(e_n)
        if e_n <= res_tol:
            break
    err = np.array(err)
    it = len(err)
    err_n = min(it // 3, 10)
    if it >= 6:
        conv = (err[-1] / err[-err_n]) ** (1.0 / (err_n - 1))
    else:
        conv = 0.0
    return x, conv, err


class TestSmoothers:
    def test_jacobi_matches_formula(self, rng):
        A = poisson1d(32)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        b = rng.randn(32)
        x0 = rng.randn(32)
        got = np.asarray(jacobi(Ac, jnp.asarray(b), jnp.asarray(x0), omega=0.7, nu=3))
        x = x0.copy()
        Dinv = 1.0 / A.diagonal()
        for _ in range(3):
            x = x + 0.7 * Dinv * (b - A @ x)
        np.testing.assert_allclose(got, x, atol=1e-12)

    def test_l1_jacobi_reduces_error(self, rng):
        A = poisson2d(10)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        x_star = rng.randn(100)
        b = A @ x_star
        x = jnp.zeros(100)
        for _ in range(10):
            x = l1_jacobi(Ac, jnp.asarray(b), x, nu=5)
        assert np.linalg.norm(np.asarray(x) - x_star) < np.linalg.norm(x_star)

    def test_chebyshev_matches_ideal_polynomial(self, rng):
        # Error propagation of the Chebyshev smoother on each eigenvector of
        # D^-1 A must equal the ideal scaled-shifted Chebyshev polynomial
        # T_d((theta-lam)/delta)/T_d(theta/delta).
        n = 64
        A = poisson1d(n)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        B = np.diag(1.0 / A.diagonal()) @ A.toarray()
        lam, V = np.linalg.eig(B)
        lam = np.real(lam)
        lmax = lam.max()
        deg, lmin_frac = 4, 0.25
        lmin = lmax * lmin_frac
        theta, delta = (lmax + lmin) / 2, (lmax - lmin) / 2

        def ideal(l):
            z = (theta - l) / delta
            if abs(z) >= 1:
                return np.cosh(deg * np.arccosh(abs(z))) * np.sign(z) ** deg
            return np.cos(deg * np.arccos(z))

        T0 = np.cosh(deg * np.arccosh(theta / delta))
        order = np.argsort(lam)
        for idx in [order[0], order[len(order) // 2], order[-2]]:
            e0 = np.real(V[:, idx])
            x = chebyshev(
                Ac, jnp.zeros(n), jnp.asarray(-e0), lmax,
                lmin_frac=lmin_frac, degree=deg,
            )
            fac = np.linalg.norm(np.asarray(x)) / np.linalg.norm(e0)
            np.testing.assert_allclose(fac, abs(ideal(lam[idx])) / T0, rtol=1e-6)

    def test_multicolor_gs_reduces_residual(self, rng):
        A = poisson2d(8)
        colors = greedy_coloring(A)
        nc = int(colors.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        x_star = rng.randn(64)
        b = A @ x_star
        x = multicolor_gauss_seidel(
            Ac, jnp.asarray(b), jnp.zeros(64), jnp.asarray(colors), nc, nu=3
        )
        assert np.linalg.norm(b - A @ np.asarray(x)) < 0.5 * np.linalg.norm(b)


class TestInterp:
    def test_sa_dense_matches_scipy(self, rng):
        n, size = 48, 3
        A = poisson1d(n)
        agg = grouped_agg(n, size)
        k = n // size
        omega = 0.6
        got = np.asarray(
            sa_interpolation_dense(
                CSR.from_scipy(A, dtype=jnp.float64), jnp.asarray(agg), k, omega=omega
            )
        )
        Agg = sp.csr_matrix((np.ones(n), (np.arange(n), agg)), shape=(n, k))
        Dinv = sp.diags(1.0 / A.diagonal())
        ref = ((sp.eye(n) - omega * Dinv @ A) @ Agg).toarray()
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_sa_sparse_matches_dense(self, rng):
        n, size = 30, 3
        A = poisson1d(n)
        agg = grouped_agg(n, size)
        k = n // size
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.5))
        Ps = smoothed_aggregation(Ac, jnp.asarray(agg), k, omega=0.5)
        np.testing.assert_allclose(np.asarray(Ps.todense()), Pd, atol=1e-12)


class TestTwoLevel:
    def test_conv_factor_matches_oracle_1d(self, rng):
        n, size = 63, 3
        A = poisson1d(n)
        agg = grouped_agg(n, size)
        k = (n + size - 1) // size
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.6)
        b = np.zeros(n)
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)

        x, conv, err, iters = twolevel_solve(
            Ac, P, jnp.asarray(b), jnp.asarray(x0), res_tol=1e-10
        )
        Pn = np.asarray(P)
        _, conv_ref, err_ref = numpy_twolevel_jacobi(A, Pn, b, x0, res_tol=1e-10)
        assert int(iters) == len(err_ref)
        np.testing.assert_allclose(float(conv), conv_ref, rtol=1e-8)
        assert 0 < float(conv) < 0.7

    def test_conv_factor_matches_oracle_2d(self, rng):
        nx = 12
        A = poisson2d(nx)
        n = A.shape[0]
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65)
        b = np.zeros(n)
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        x, conv, err, iters = twolevel_solve(
            Ac, P, jnp.asarray(b), jnp.asarray(x0), res_tol=1e-10
        )
        _, conv_ref, err_ref = numpy_twolevel_jacobi(A, np.asarray(P), b, x0)
        np.testing.assert_allclose(float(conv), conv_ref, rtol=1e-8)

    def test_chebyshev_smoother_default_lmax(self, rng):
        # smoother="chebyshev" without smoother_args must work (default lmax
        # via power iteration) and converge on SPD Poisson
        nx = 12
        A = poisson2d(nx)
        n = A.shape[0]
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65)
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        x, conv, err, iters = twolevel_solve(
            Ac, P, jnp.zeros(n), jnp.asarray(x0), res_tol=1e-10,
            smoother="chebyshev",
        )
        assert float(conv) < 0.5
        assert np.linalg.norm(A @ np.asarray(x)) < 1e-9

    def test_sparse_P_equals_dense_P(self, rng):
        n, size = 30, 3
        A = poisson1d(n)
        agg = grouped_agg(n, size)
        k = n // size
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.5)
        Ps = smoothed_aggregation(Ac, jnp.asarray(agg), k, omega=0.5)
        b = np.zeros(n)
        x0 = rng.randn(n)
        _, conv_d, _, it_d = twolevel_solve(Ac, Pd, jnp.asarray(b), jnp.asarray(x0), res_tol=1e-10)
        _, conv_s, _, it_s = twolevel_solve(Ac, Ps, jnp.asarray(b), jnp.asarray(x0), res_tol=1e-10)
        assert int(it_d) == int(it_s)
        np.testing.assert_allclose(float(conv_d), float(conv_s), rtol=1e-10)

    def test_singular_neumann(self, rng):
        # 1D Neumann: A ones-nullspace; solver must converge with the
        # Lagrange-bordered coarse solve and mean subtraction.
        n = 32
        A = poisson1d(n).tolil()
        A[0, 0] = 1.0
        A[0, 1] = -1.0
        A[-1, -1] = 1.0
        A[-1, -2] = -1.0
        A = A.tocsr()
        agg = grouped_agg(n, 4)
        k = n // 4
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.6)
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        x, conv, err, iters = twolevel_solve(
            Ac, P, jnp.zeros(n), jnp.asarray(x0), error_tol=1e-8, singular=True
        )
        assert float(conv) < 1.0
        assert np.abs(np.asarray(x)).max() < 1e-6 or int(iters) < 500

    def test_jit_compiles_once(self, rng):
        n = 24
        A = poisson1d(n)
        agg = grouped_agg(n, 3)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), 8, omega=0.6)
        f = jax.jit(lambda a, p, b, x: twolevel_solve(a, p, b, x, res_tol=1e-10))
        x0 = jnp.asarray(rng.randn(n))
        out1 = f(Ac, P, jnp.zeros(n), x0)
        out2 = f(Ac, P, jnp.zeros(n), x0)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))


class TestVCycle:
    def test_sparse_hierarchy_solves_poisson2d(self, rng):
        # first coarse level kept sparse (SpGEMM Galerkin product)
        A = poisson2d(16)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        w = int(np.diff(A.indptr).max())
        h = build_hierarchy(Ac, alpha=0.15, max_levels=3, min_coarse=8, width=w,
                            sparse_levels=1)
        assert isinstance(h.As[1], CSR)  # sparse coarse operator
        x_star = rng.randn(n)
        b = A @ x_star
        x, conv, err, iters = vcycle_solve(h, jnp.asarray(b), jnp.zeros(n), res_tol=1e-8)
        assert np.linalg.norm(np.asarray(x) - x_star) / np.linalg.norm(x_star) < 1e-6

    def test_hierarchy_solves_poisson2d(self, rng):
        A = poisson2d(16)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        w = int(np.diff(A.indptr).max())
        h = build_hierarchy(Ac, alpha=0.15, max_levels=3, min_coarse=8, width=w)
        x_star = rng.randn(n)
        b = A @ x_star
        x, conv, err, iters = vcycle_solve(h, jnp.asarray(b), jnp.zeros(n), res_tol=1e-8)
        assert np.linalg.norm(np.asarray(x) - x_star) / np.linalg.norm(x_star) < 1e-6
        assert float(conv) < 0.9


class TestKrylov:
    def test_pcg_spd(self, rng):
        A = poisson2d(10)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        x_star = rng.randn(n)
        b = A @ x_star
        x, hist, iters = pcg(Ac, jnp.asarray(b), tol=1e-10)
        np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-6)

    def test_pcg_preconditioned_faster(self, rng):
        A = poisson2d(12)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        Dinv = jnp.asarray(1.0 / A.diagonal())
        x_star = rng.randn(n)
        b = jnp.asarray(A @ x_star)
        _, _, it_plain = pcg(Ac, b, tol=1e-10)
        agg = (np.arange(n) // 12 // 2) * 6 + (np.arange(n) % 12) // 2
        k = int(agg.max()) + 1
        P = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65)
        AH = np.asarray(P).T @ (A @ np.asarray(P))
        cs = CoarseSolver.factor(jnp.asarray(AH))

        from mlamg_tpu.ops.matmul import spmv

        def M(r):
            # one two-level V-cycle as preconditioner
            x = 0.666 * Dinv * r
            rr = r - spmv(Ac, x)
            x = x + P @ cs.solve(P.T @ rr)
            return x + 0.666 * Dinv * (r - spmv(Ac, x))

        _, _, it_prec = pcg(Ac, b, M=M, tol=1e-10)
        assert int(it_prec) < int(it_plain)

    def test_fgmres_nonsymmetric(self, rng):
        n = 80
        A = poisson1d(n) + sp.diags([0.5 * np.ones(n - 1)], [1])
        A = sp.csr_matrix(A)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        x_star = rng.randn(n)
        b = A @ x_star
        x, hist, iters = fgmres(Ac, jnp.asarray(b), restart=20, tol=1e-10)
        np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-6)

    def test_fgmres_inner_early_exit(self, rng):
        # well-conditioned system: must converge in far fewer inner steps
        # than restart*max_restarts, with a per-inner-iteration history
        n = 60
        A = sp.csr_matrix(sp.eye(n) + 0.01 * sp.random(n, n, density=0.2,
                                                       random_state=rng))
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        x_star = rng.randn(n)
        b = A @ x_star
        x, hist, iters = fgmres(
            Ac, jnp.asarray(b), restart=50, max_restarts=4, tol=1e-12
        )
        np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-9)
        assert int(iters) < 25  # early exit inside the first cycle
        h = np.asarray(hist)
        live = h[: int(iters)]
        assert np.all(live > 0)  # per-iteration residual estimates recorded
        assert np.all(np.diff(live) <= 1e-12)  # GMRES residual is monotone
        assert np.all(h[int(iters):] == 0)


class TestCoarseSolver:
    def test_plain(self, rng):
        A = rng.randn(12, 12)
        A = A @ A.T + 12 * np.eye(12)
        cs = CoarseSolver.factor(jnp.asarray(A))
        r = rng.randn(12)
        np.testing.assert_allclose(
            np.asarray(cs.solve(jnp.asarray(r))), np.linalg.solve(A, r), atol=1e-9
        )

    def test_singular(self, rng):
        # Laplacian of a path graph: nullspace = constants
        n = 10
        A = poisson1d(n).toarray()
        A[0, 0] = 1.0
        A[-1, -1] = 1.0
        r = rng.randn(n)
        r -= r.mean()  # consistent rhs
        cs = CoarseSolver.factor(jnp.asarray(A), singular=True)
        e = np.asarray(cs.solve(jnp.asarray(r)))
        np.testing.assert_allclose(A @ e, r, atol=1e-8)
