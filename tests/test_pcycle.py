"""Distributed solver path: row-partitioned two-level / V-cycle / Lloyd
must match their serial counterparts (VERDICT r1 item 3; role of the
reference's amg_2_v under scale, ns/lib/multigrid.py:111-210)."""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

from mlamg_tpu.ops import CSR, matmul
from mlamg_tpu.parallel import (
    make_mesh,
    PartitionedELL,
    gather_global,
    ptwolevel_solve,
    pvcycle_solve,
    plloyd,
)
from mlamg_tpu.mg.cycle import twolevel_solve, vcycle_solve, Hierarchy
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.mg.interp import sa_interpolation_dense
from mlamg_tpu.graph.lloyd import lloyd_aggregation


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I)).tocsr()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestPTwoLevel:
    def test_matches_serial_conv(self, rng):
        nx = 16
        A = poisson2d(nx)
        n = A.shape[0]
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65))
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        b = np.zeros(n)

        _, conv_s, _, it_s = twolevel_solve(
            Ac, jnp.asarray(P), jnp.asarray(b), jnp.asarray(x0),
            res_tol=1e-8, max_iter=300,
        )
        mesh = make_mesh(pop=1, row=8)
        Ap = PartitionedELL.from_scipy(A, 8, halo=nx, dtype=jnp.float64)
        xs, conv_p, _, it_p = ptwolevel_solve(
            Ap, P, b, x0, mesh, res_tol=1e-8, max_iter=300
        )
        assert int(it_s) == int(it_p)
        assert abs(float(conv_s) - float(conv_p)) < 1e-6
        x_par = gather_global(xs, mesh).ravel()[:n]
        assert np.linalg.norm(b - A @ x_par) < 1e-7

    def test_rhs_solve(self, rng):
        # nonzero RHS: the distributed solve must reach the same solution
        nx = 12
        A = poisson2d(nx)
        n = A.shape[0]
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65))
        b = rng.randn(n)
        x0 = np.zeros(n)
        mesh = make_mesh(pop=1, row=8)
        Ap = PartitionedELL.from_scipy(A, 8, halo=nx, dtype=jnp.float64)
        xs, conv, _, _ = ptwolevel_solve(
            Ap, P, b, x0, mesh, res_tol=1e-10 * np.linalg.norm(b), max_iter=400
        )
        x_par = gather_global(xs, mesh).ravel()[:n]
        x_ref = sp.linalg.spsolve(A, b)
        np.testing.assert_allclose(x_par, x_ref, atol=1e-8)


class TestPVcycle:
    def test_matches_serial_vcycle(self, rng):
        nx = 24
        A = poisson2d(nx)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        agg0 = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k1 = int(agg0.max()) + 1
        P0 = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg0), k1, omega=0.65))
        A1 = np.asarray(matmul.rap_dense(Ac, jnp.asarray(P0)))
        m = nx // 2
        agg1 = (np.arange(k1) // m // 2) * (m // 2) + (np.arange(k1) % m) // 2
        k2 = int(agg1.max()) + 1
        d1 = np.diag(A1)
        Dinv1 = 1.0 / np.where(d1 != 0, d1, 1.0)
        T1 = np.zeros((k1, k2))
        T1[np.arange(k1), agg1] = 1.0
        P1 = T1 - 0.65 * Dinv1[:, None] * (A1 @ T1)
        A2 = P1.T @ A1 @ P1
        d0 = A.diagonal()
        h_full = Hierarchy(
            As=(Ac, jnp.asarray(A1)),
            Ps=(jnp.asarray(P0), jnp.asarray(P1)),
            Dinvs=(jnp.asarray(1.0 / d0), jnp.asarray(Dinv1)),
            coarse=CoarseSolver.factor(jnp.asarray(A2)),
        )
        h_coarse = Hierarchy(
            As=(jnp.asarray(A1),),
            Ps=(jnp.asarray(P1),),
            Dinvs=(jnp.asarray(Dinv1),),
            coarse=CoarseSolver.factor(jnp.asarray(A2)),
        )
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        b = np.zeros(n)
        _, conv_s, _, it_s = vcycle_solve(
            h_full, jnp.asarray(b), jnp.asarray(x0), res_tol=1e-8, max_iter=200
        )
        mesh = make_mesh(pop=1, row=8)
        Ap = PartitionedELL.from_scipy(A, 8, halo=nx, dtype=jnp.float64)
        xs, conv_p, _, it_p = pvcycle_solve(
            Ap, P0, h_coarse, b, x0, mesh, res_tol=1e-8, max_iter=200
        )
        assert int(it_s) == int(it_p)
        assert abs(float(conv_s) - float(conv_p)) < 1e-6
        x_par = gather_global(xs, mesh).ravel()[:n]
        assert np.linalg.norm(b - A @ x_par) < 1e-7

    def test_two_level_mode(self, rng):
        # coarse_hierarchy=None: distributed RAP + replicated LU
        nx = 16
        A = poisson2d(nx)
        n = A.shape[0]
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        P = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65))
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        mesh = make_mesh(pop=1, row=8)
        Ap = PartitionedELL.from_scipy(A, 8, halo=nx, dtype=jnp.float64)
        xs, conv, _, _ = pvcycle_solve(
            Ap, P, None, np.zeros(n), x0, mesh, res_tol=1e-8, max_iter=300
        )
        assert float(conv) < 0.8
        x_par = gather_global(xs, mesh).ravel()[:n]
        assert np.linalg.norm(A @ x_par) < 1e-7


class TestPLloyd:
    def test_matches_serial_1d(self, rng):
        n = 64
        w = rng.rand(n - 1) + 0.1
        C = sp.diags([w, w], [-1, 1]).tocsr()
        Cc = CSR.from_scipy(C, dtype=jnp.float64)
        seeds = np.sort(rng.permutation(n)[:6]).astype(np.int32)
        agg_s, roots_s, _ = lloyd_aggregation(Cc, seeds=seeds, maxiter=5)

        mesh = make_mesh(pop=1, row=8)
        Cp = PartitionedELL.from_scipy(C, 8, halo=1, dtype=jnp.float64)
        agg_p, centers_p = plloyd(Cp, seeds, mesh, maxiter=5)
        agg_p = gather_global(agg_p, mesh).ravel()[:n]
        np.testing.assert_array_equal(np.asarray(agg_s), agg_p)
        np.testing.assert_array_equal(
            np.sort(np.asarray(roots_s)), np.sort(np.asarray(centers_p))
        )

    def test_matches_serial_2d(self, rng):
        nx = 12
        A = poisson2d(nx)
        G = abs(A)
        G.setdiag(0)
        G.eliminate_zeros()
        n = G.shape[0]
        Cc = CSR.from_scipy(G, dtype=jnp.float64)
        seeds = np.sort(rng.permutation(n)[:12]).astype(np.int32)
        agg_s, roots_s, _ = lloyd_aggregation(Cc, seeds=seeds, maxiter=4)

        mesh = make_mesh(pop=1, row=8)
        Cp = PartitionedELL.from_scipy(G, 8, halo=nx, dtype=jnp.float64)
        agg_p, centers_p = plloyd(Cp, seeds, mesh, maxiter=4)
        agg_p = gather_global(agg_p, mesh).ravel()[:n]
        np.testing.assert_array_equal(np.asarray(agg_s), agg_p)
        np.testing.assert_array_equal(
            np.sort(np.asarray(roots_s)), np.sort(np.asarray(centers_p))
        )
