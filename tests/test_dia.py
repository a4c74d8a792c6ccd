"""DIA format + Pallas stencil SpMV tests vs scipy oracles."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import DIA, CSR, ELL, auto_format
from mlamg_tpu.ops.dia import dia_spmv, dia_spmv_t, dia_spmm
from mlamg_tpu.ops.matmul import spmv, spmv_t, spmm
from mlamg_tpu.ops.pallas_kernels import dia_spmv_pallas


def poisson2d(nx, dtype=np.float64):
    I = sp.eye(nx, format="csr", dtype=dtype)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=dtype)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def random_banded(rng, n, offsets):
    diags = [rng.randn(n - abs(o)) for o in offsets]
    return sp.diags(diags, offsets, shape=(n, n)).tocsr()


class TestDIA:
    def test_roundtrip(self, rng):
        A = random_banded(rng, 50, [-7, -1, 0, 2, 11])
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        assert abs(Ad.to_scipy() - A).max() < 1e-12

    def test_spmv_matches_scipy(self, rng):
        A = random_banded(rng, 64, [-5, -1, 0, 1, 9])
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        x = rng.randn(64)
        np.testing.assert_allclose(
            np.asarray(jax.jit(dia_spmv)(Ad, jnp.asarray(x))), A @ x, atol=1e-12
        )

    def test_spmv_t_matches_scipy(self, rng):
        A = random_banded(rng, 48, [-3, 0, 4])
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        x = rng.randn(48)
        np.testing.assert_allclose(
            np.asarray(jax.jit(dia_spmv_t)(Ad, jnp.asarray(x))), A.T @ x, atol=1e-12
        )

    def test_spmm_matches_scipy(self, rng):
        A = random_banded(rng, 32, [-2, 0, 1])
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        X = rng.randn(32, 5)
        np.testing.assert_allclose(
            np.asarray(jax.jit(dia_spmm)(Ad, jnp.asarray(X))), A @ X, atol=1e-12
        )

    def test_diagonal(self, rng):
        A = random_banded(rng, 20, [-1, 0, 1])
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(Ad.diagonal()), A.diagonal(), atol=1e-12)

    def test_matmul_dispatch(self, rng):
        A = poisson2d(8)
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        x = rng.randn(64)
        X = rng.randn(64, 3)
        np.testing.assert_allclose(np.asarray(spmv(Ad, jnp.asarray(x))), A @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(spmv_t(Ad, jnp.asarray(x))), A.T @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(spmm(Ad, jnp.asarray(X))), A @ X, atol=1e-12)

    def test_twolevel_solver_accepts_dia(self, rng):
        # DIA operator through the full two-level cycle must match CSR
        from mlamg_tpu.mg import sa_interpolation_dense, twolevel_solve

        A = poisson2d(8)
        n = A.shape[0]
        agg = jnp.asarray(np.arange(n) // 4)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, agg, 16, omega=0.6)
        x0 = jnp.asarray(rng.randn(n))
        _, conv_c, _, it_c = twolevel_solve(Ac, P, jnp.zeros(n), x0, res_tol=1e-10)
        _, conv_d, _, it_d = twolevel_solve(Ad, P, jnp.zeros(n), x0, res_tol=1e-10)
        assert int(it_c) == int(it_d)
        np.testing.assert_allclose(float(conv_c), float(conv_d), rtol=1e-10)

    def test_auto_format(self, rng):
        A = poisson2d(8)
        assert isinstance(auto_format(A), DIA)
        R = sp.random(64, 64, density=0.5, format="csr", random_state=rng)
        assert isinstance(auto_format(R, max_diagonals=16), ELL)


class TestPallasDIA:
    def test_kernel_matches_scipy_interpret(self, rng):
        A = poisson2d(16, dtype=np.float32)  # n = 256, % 128 == 0
        Ad = DIA.from_scipy(A, dtype=jnp.float32)
        x = rng.randn(256).astype(np.float32)
        y = dia_spmv_pallas(Ad, jnp.asarray(x), block_rows=256, interpret=True)
        np.testing.assert_allclose(np.asarray(y), (A @ x).astype(np.float32), rtol=1e-5)

    def test_kernel_multi_block_interpret(self, rng):
        A = poisson2d(32, dtype=np.float32)  # n = 1024 -> blocks of 256
        Ad = DIA.from_scipy(A, dtype=jnp.float32)
        x = rng.randn(1024).astype(np.float32)
        y = dia_spmv_pallas(Ad, jnp.asarray(x), block_rows=256, interpret=True)
        np.testing.assert_allclose(np.asarray(y), (A @ x).astype(np.float32), rtol=1e-5)

    def test_kernel_clamped_window_interpret(self, rng):
        # large-n path: no x pad; clamped window + guard rows must stay exact
        # at the first/last blocks where the window clamp shifts indices
        n = 128 * 64
        A = random_banded(rng, n, [-130, -128, -1, 0, 1, 127, 256]).astype(np.float32)
        Ad = DIA.from_scipy(A, dtype=jnp.float32)
        x = rng.randn(n).astype(np.float32)
        y = dia_spmv_pallas(Ad, jnp.asarray(x), block_rows=2048, interpret=True)
        ref = (A @ x).astype(np.float32)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)

    def test_blocked_dia_matches(self, rng):
        from mlamg_tpu.ops.pallas_kernels import blocked_dia

        A = poisson2d(32, dtype=np.float32)
        Ad = blocked_dia(DIA.from_scipy(A, dtype=jnp.float32))
        assert Ad.data.ndim == 3
        x = rng.randn(1024).astype(np.float32)
        y = dia_spmv_pallas(Ad, jnp.asarray(x), block_rows=256, interpret=True)
        np.testing.assert_allclose(np.asarray(y), (A @ x).astype(np.float32), rtol=1e-5)

    def test_kernel_affine_interpret(self, rng):
        # y = alpha*(A@x) + c — the fused residual / Jacobi-sweep form
        A = poisson2d(16, dtype=np.float32)
        Ad = DIA.from_scipy(A, dtype=jnp.float32)
        x = rng.randn(256).astype(np.float32)
        c = rng.randn(256).astype(np.float32)
        y = dia_spmv_pallas(
            Ad, jnp.asarray(x), c=jnp.asarray(c), alpha=-1.0,
            block_rows=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), (c - A @ x).astype(np.float32), rtol=1e-5, atol=1e-5)

    def test_jacobi_operator_sweep_matches_unfused(self, rng):
        from mlamg_tpu.ops.dia import dia_jacobi_operator
        from mlamg_tpu.mg import jacobi

        A = poisson2d(8)
        n = A.shape[0]
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        d = Ad.diagonal()
        Dinv = 1.0 / d
        M = dia_jacobi_operator(Ad, Dinv, 0.666)
        b = jnp.asarray(rng.randn(n))
        x = jnp.asarray(rng.randn(n))
        fused = dia_spmv(M, x) + 0.666 * Dinv * b
        ref = jacobi(Ad, b, x, Dinv, omega=0.666, nu=1)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-12)

    def test_twolevel_fused_jacobi_matches(self, rng):
        from mlamg_tpu.mg import sa_interpolation_dense, twolevel_solve

        A = poisson2d(8)
        n = A.shape[0]
        agg = jnp.asarray(np.arange(n) // 4)
        Ad = DIA.from_scipy(A, dtype=jnp.float64)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P = sa_interpolation_dense(Ac, agg, 16, omega=0.6)
        x0 = jnp.asarray(rng.randn(n))
        _, conv_f, _, it_f = twolevel_solve(
            Ad, P, jnp.zeros(n), x0, res_tol=1e-8, fused_jacobi=True)
        _, conv_u, _, it_u = twolevel_solve(
            Ad, P, jnp.zeros(n), x0, res_tol=1e-8, fused_jacobi=False)
        assert abs(int(it_f) - int(it_u)) <= 1
        np.testing.assert_allclose(float(conv_f), float(conv_u), rtol=1e-6)

    def test_blocked_dia_all_ops_normalize_layout(self, rng):
        # blocked (D, n/128, 128) DIA must stay correct through every DIA op
        from mlamg_tpu.ops.pallas_kernels import blocked_dia

        A = poisson2d(16, dtype=np.float32)  # n = 256
        Ab = blocked_dia(DIA.from_scipy(A, dtype=jnp.float32))
        x = rng.randn(256).astype(np.float32)
        X = rng.randn(256, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(spmv(Ab, jnp.asarray(x))), A @ x, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(spmv_t(Ab, jnp.asarray(x))), A.T @ x, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(spmm(Ab, jnp.asarray(X))), A @ X, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(Ab.diagonal()), A.diagonal(), rtol=1e-6)
        assert abs(Ab.to_scipy() - A).max() < 1e-6
