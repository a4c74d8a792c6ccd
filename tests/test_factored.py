"""Factored SA prolongator (mg/factored.py): P = S·T applied by factors.

Oracle: the materialized dense P from mg/interp.sa_interpolation_dense —
the factored apply must match it exactly (same math, different schedule),
and the two-level solve built on it must reproduce the dense-P convergence
factor."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import CSR, DIA
from mlamg_tpu.ops.pallas_kernels import blocked_dia
from mlamg_tpu.mg import (
    AggOp,
    BoxAgg2D,
    CoarseSolver,
    FactoredSA,
    coarse_operator_factored,
    dia_transpose,
    factored_sa,
    sa_interpolation_dense,
    twolevel_solve,
)


def poisson2d(nx):
    I = sp.eye(nx, format="csr")
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def box_agg_id(nx, side):
    n = nx * nx
    ii, jj = np.arange(n) // nx, np.arange(n) % nx
    return (ii // side) * (nx // side) + (jj // side)


def test_dia_transpose_matches_scipy():
    A = poisson2d(16) + sp.diags(np.linspace(0.1, 1.0, 256), 2, shape=(256, 256))
    Ad = DIA.from_scipy(A.tocsr(), dtype=jnp.float64)
    At = dia_transpose(Ad)
    np.testing.assert_allclose(
        At.to_scipy().toarray(), A.T.toarray(), rtol=0, atol=1e-14
    )


def test_box_agg_matches_one_hot():
    T = BoxAgg2D(ny=16, nx=16, sy=4, sx=4)
    agg = box_agg_id(16, 4)
    np.testing.assert_array_equal(np.asarray(T.agg_id), agg)
    Td = np.eye(T.k)[agg]  # (n, k) one-hot
    e = np.random.RandomState(0).randn(T.k)
    v = np.random.RandomState(1).randn(T.n)
    np.testing.assert_allclose(np.asarray(T.interp(jnp.asarray(e))), Td @ e, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(T.restrict(jnp.asarray(v))), Td.T @ v, atol=1e-12
    )
    # matrix block forms
    E = np.random.RandomState(2).randn(T.k, 3)
    V = np.random.RandomState(3).randn(T.n, 3)
    np.testing.assert_allclose(np.asarray(T.interp(jnp.asarray(E))), Td @ E, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(T.restrict(jnp.asarray(V))), Td.T @ V, atol=1e-12
    )


def test_agg_op_unassigned_rows_are_zero():
    agg = jnp.asarray([0, 1, 1, 5, 0], jnp.int32)  # node 3 unassigned (k=2)
    T = AggOp(agg, n=5, k=2)
    e = jnp.asarray([2.0, 3.0])
    out = np.asarray(T.interp(e))
    np.testing.assert_allclose(out, [2.0, 3.0, 3.0, 0.0, 2.0])
    v = jnp.asarray([1.0, 10.0, 100.0, 7.0, 0.5])
    np.testing.assert_allclose(np.asarray(T.restrict(v)), [1.5, 110.0])


@pytest.mark.parametrize("fmt", ["dia", "csr"])
def test_factored_matches_dense_P(fmt):
    nx, side = 32, 4
    A = poisson2d(nx)
    agg = box_agg_id(nx, side)
    k = int(agg.max()) + 1
    if fmt == "dia":
        Aop = DIA.from_scipy(A, dtype=jnp.float64)
    else:
        Aop = CSR.from_scipy(A, dtype=jnp.float64)
    omega = 0.65
    P_dense = sa_interpolation_dense(Aop, jnp.asarray(agg), k, omega=omega)
    Pf = factored_sa(Aop, BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side), omega=omega)
    np.testing.assert_allclose(
        np.asarray(Pf.densify()), np.asarray(P_dense), rtol=0, atol=1e-12
    )
    e = jnp.asarray(np.random.RandomState(0).randn(k))
    r = jnp.asarray(np.random.RandomState(1).randn(nx * nx))
    np.testing.assert_allclose(
        np.asarray(Pf.interp(e)), np.asarray(P_dense @ e), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(Pf.restrict(r)), np.asarray(P_dense.T @ r), atol=1e-12
    )
    # general AggOp gives the same operator as the structured BoxAgg2D
    Pg = factored_sa(Aop, AggOp(jnp.asarray(agg), n=nx * nx, k=k), omega=omega)
    np.testing.assert_allclose(
        np.asarray(Pg.interp(e)), np.asarray(P_dense @ e), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(Pg.restrict(r)), np.asarray(P_dense.T @ r), atol=1e-12
    )


def test_coarse_operator_factored_matches_rap():
    nx, side = 32, 4
    A = poisson2d(nx)
    agg = box_agg_id(nx, side)
    k = int(agg.max()) + 1
    Aop = DIA.from_scipy(A, dtype=jnp.float64)
    omega = 0.65
    P_dense = np.asarray(sa_interpolation_dense(Aop, jnp.asarray(agg), k, omega=omega))
    Pf = factored_sa(Aop, BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side), omega=omega)
    A_H = np.asarray(coarse_operator_factored(Aop, Pf, block=24))
    oracle = P_dense.T @ (A @ P_dense)
    np.testing.assert_allclose(A_H, oracle, rtol=0, atol=1e-11)


def test_twolevel_solve_factored_matches_dense():
    nx, side = 32, 4
    A = poisson2d(nx)
    n = nx * nx
    agg = box_agg_id(nx, side)
    k = int(agg.max()) + 1
    Aop = DIA.from_scipy(A, dtype=jnp.float64)
    omega = 0.65
    P_dense = sa_interpolation_dense(Aop, jnp.asarray(agg), k, omega=omega)
    Pf = factored_sa(Aop, BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side), omega=omega)
    b = jnp.zeros(n, jnp.float64)
    x0 = jnp.asarray(np.random.RandomState(0).randn(n))
    xd, convd, _, itd = twolevel_solve(Aop, P_dense, b, x0, error_tol=1e-9)
    xf, convf, _, itf = twolevel_solve(Aop, Pf, b, x0, error_tol=1e-9)
    assert float(convd) < 0.9  # 1/16 coarsening: modest but converging
    assert abs(float(convd) - float(convf)) < 1e-8
    assert int(itd) == int(itf)


def test_coarse_solver_inverse_matches_lu():
    rs = np.random.RandomState(0)
    A_H = rs.randn(40, 40)
    A_H = A_H @ A_H.T + 40 * np.eye(40)  # SPD
    r = jnp.asarray(rs.randn(40))
    lu = CoarseSolver.factor(jnp.asarray(A_H))
    iv = CoarseSolver.factor(jnp.asarray(A_H), method="inverse")
    np.testing.assert_allclose(
        np.asarray(iv.solve(r)), np.asarray(lu.solve(r)), rtol=0, atol=1e-10
    )
    # singular (bordered) variant
    L = sp.csgraph.laplacian(sp.random(30, 30, 0.3, random_state=1) + sp.eye(30))
    L = np.asarray((L + L.T).todense() / 2)
    rs2 = np.random.RandomState(2).randn(30)
    rs2 -= rs2.mean()
    lu = CoarseSolver.factor(jnp.asarray(L), singular=True)
    iv = CoarseSolver.factor(jnp.asarray(L), singular=True, method="inverse")
    np.testing.assert_allclose(
        np.asarray(iv.solve(jnp.asarray(rs2))),
        np.asarray(lu.solve(jnp.asarray(rs2))),
        rtol=0,
        atol=1e-8,
    )


def test_factored_blocked_dia_cpu_path():
    """Blocked (D, n/128, 128) layout survives the factored pipeline."""
    nx, side = 16, 4  # n=256 = 2*128
    A = poisson2d(nx)
    agg = box_agg_id(nx, side)
    Aop = blocked_dia(DIA.from_scipy(A, dtype=jnp.float32))
    Pf = factored_sa(Aop, BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side), omega=0.65)
    assert Pf.Ss[0].data.ndim == 3 and Pf.Sts[0].data.ndim == 3
    P_dense = sa_interpolation_dense(
        DIA.from_scipy(A, dtype=jnp.float32), jnp.asarray(agg), Pf.shape[1], omega=0.65
    )
    e = jnp.asarray(np.random.RandomState(0).randn(Pf.shape[1]).astype(np.float32))
    r = jnp.asarray(np.random.RandomState(1).randn(nx * nx).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(Pf.interp(e)), np.asarray(P_dense @ e), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Pf.restrict(r)), np.asarray(P_dense.T @ r), rtol=2e-5, atol=2e-5
    )
