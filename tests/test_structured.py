"""Structured all-DIA hierarchy (mg/structured.py): colored-probing Galerkin
operators vs explicit scipy RAP, and the V-cycle built on them."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from mlamg_tpu.ops import DIA
from mlamg_tpu.mg import BoxAgg2D, factored_sa, sa_interpolation_dense
from mlamg_tpu.mg.structured import dia_galerkin_probe, build_structured_hierarchy
from mlamg_tpu.mg.cycle import vcycle_solve


def poisson2d(nx, aniso=1.0):
    I = sp.eye(nx, format="csr")
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (aniso * sp.kron(I, T) + sp.kron(T, I)).tocsr()


def test_probed_galerkin_matches_scipy_rap():
    nx, side = 32, 4
    A = poisson2d(nx, aniso=0.3)
    n = nx * nx
    Ad = DIA.from_scipy(A, dtype=jnp.float64)
    T = BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side)
    P = factored_sa(Ad, T, omega=0.7)
    AH = dia_galerkin_probe(Ad, P)
    Pd = np.asarray(
        sa_interpolation_dense(Ad, jnp.asarray(np.asarray(T.agg_id)), T.k, omega=0.7)
    )
    oracle = Pd.T @ (A.astype(np.float64) @ Pd)
    np.testing.assert_allclose(
        np.asarray(AH.to_scipy().todense()), oracle, rtol=0, atol=1e-11
    )


def test_probed_galerkin_rect_boxes_and_grid():
    ny, nx = 24, 48
    I_y = sp.eye(ny)
    I_x = sp.eye(nx)
    Ty = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    Tx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    A = (sp.kron(Ty, I_x) + sp.kron(I_y, Tx)).tocsr()  # row-major (y, x)
    Ad = DIA.from_scipy(A, dtype=jnp.float64)
    T = BoxAgg2D(ny=ny, nx=nx, sy=3, sx=6)
    P = factored_sa(Ad, T, omega=0.66)
    AH = dia_galerkin_probe(Ad, P)
    Pd = np.asarray(
        sa_interpolation_dense(Ad, jnp.asarray(np.asarray(T.agg_id)), T.k, omega=0.66)
    )
    oracle = Pd.T @ (A.astype(np.float64) @ Pd)
    np.testing.assert_allclose(
        np.asarray(AH.to_scipy().todense()), oracle, rtol=0, atol=1e-11
    )


def test_structured_vcycle_converges():
    nx = 64
    A = poisson2d(nx)
    Ad = DIA.from_scipy(A, dtype=jnp.float64)
    h = build_structured_hierarchy(Ad, nx, nx, sides=(4, 4), block=False, min_coarse=8)
    assert h.num_levels == 2  # 4096 -> 256 -> 16
    n = nx * nx
    b = jnp.zeros(n, jnp.float64)
    x0 = jnp.asarray(np.random.RandomState(0).randn(n))
    x, conv, err, it = vcycle_solve(h, b, x0, res_tol=0.0, max_iter=60, nu=2)
    assert np.isfinite(float(conv))
    assert float(conv) < 0.8, float(conv)
    # error actually contracts
    live = np.asarray(err[: int(it)])
    assert live[-1] < live[0] * 1e-6
