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


def test_bilinear_probe_matches_scipy_rap():
    # probe must be exact for the geometric side-2 prolongator too,
    # including on a rectangular grid and an anisotropic stencil
    ny, nx = 16, 32
    I_y = sp.eye(ny)
    I_x = sp.eye(nx)
    Ty = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    Tx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    A = (0.25 * sp.kron(Ty, I_x) + sp.kron(I_y, Tx)).tocsr()
    Ad = DIA.from_scipy(A, dtype=jnp.float64)
    from mlamg_tpu.mg.factored import BilinearP2D

    P = BilinearP2D(ny=ny, nx=nx)
    Pd = np.asarray(P.densify()).astype(np.float64)
    AH = dia_galerkin_probe(Ad, P)
    oracle = Pd.T @ (A.astype(np.float64) @ Pd)
    np.testing.assert_allclose(
        np.asarray(AH.to_scipy().todense()), oracle, rtol=0, atol=1e-12
    )
    # Galerkin under bilinear stays a compact 9-point stencil
    assert len(AH.offsets) <= 9
    # and stays 9-point one level further down
    AH2 = dia_galerkin_probe(AH, BilinearP2D(ny=ny // 2, nx=nx // 2))
    Pd2 = np.asarray(BilinearP2D(ny=ny // 2, nx=nx // 2).densify()).astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(AH2.to_scipy().todense()),
        Pd2.T @ np.asarray(AH.to_scipy().todense()) @ Pd2,
        rtol=0,
        atol=1e-12,
    )
    assert len(AH2.offsets) <= 9


def test_bilinear_interp_restrict_are_transposes():
    from mlamg_tpu.mg.factored import BilinearP2D

    P = BilinearP2D(ny=8, nx=12)
    Pd = np.asarray(P.densify())
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(P.n).astype(np.float32))
    e = jnp.asarray(rng.randn(P.k).astype(np.float32))
    np.testing.assert_allclose(np.asarray(P.interp(e)), Pd @ np.asarray(e), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(P.restrict(v)), Pd.T @ np.asarray(v), rtol=1e-6, atol=1e-6
    )
    # batched (k, c) path used by coarse_operator_factored
    E = jnp.asarray(rng.randn(P.k, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(P.interp(E)), Pd @ np.asarray(E), rtol=1e-5, atol=1e-5
    )


def test_bilinear_hierarchy_geometric_mg_convergence():
    # side-2 bilinear hierarchy must reach geometric-MG convergence
    # (conv ~ 0.15 with a deg-3 Chebyshev smoother) where box-SA sits ~0.7
    nx = 64
    A = poisson2d(nx)
    Ad = DIA.from_scipy(A, dtype=jnp.float64)
    h = build_structured_hierarchy(
        Ad, nx, nx, sides=(2,) * 6, min_coarse=16, kind="bilinear", block=False
    )
    assert h.num_levels >= 3
    n = nx * nx
    b = jnp.zeros(n, jnp.float64)
    x0 = jnp.asarray(np.random.RandomState(0).randn(n))
    from mlamg_tpu.mg.cycle import vcycle

    x = x0
    norms = []
    for _ in range(12):
        x = vcycle(h, b, x, nu=2, smoother="chebyshev")
        norms.append(float(jnp.linalg.norm(x)))
    conv = (norms[-1] / norms[2]) ** (1.0 / (len(norms) - 3))
    assert conv < 0.25, conv
