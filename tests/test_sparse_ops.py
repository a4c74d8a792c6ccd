"""Unit tests for sparse containers and products against scipy oracles."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import COO, CSR, ELL, matmul


def random_csr(rng, m, n, density=0.1):
    A = sp.random(m, n, density=density, format="csr", random_state=rng)
    A.data = rng.randn(A.nnz)
    A.eliminate_zeros()
    A.sort_indices()
    return A


def poisson1d(n):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()


class TestContainers:
    def test_csr_roundtrip(self, rng):
        A = random_csr(rng, 37, 53)
        B = CSR.from_scipy(A, dtype=jnp.float64).to_scipy()
        assert (abs(A - B)).max() < 1e-12

    def test_coo_roundtrip(self, rng):
        A = random_csr(rng, 37, 53)
        B = COO.from_scipy(A, dtype=jnp.float64).to_scipy()
        assert (abs(A - B)).max() < 1e-12

    def test_ell_roundtrip(self, rng):
        A = random_csr(rng, 29, 31, density=0.2)
        B = ELL.from_scipy(A, dtype=jnp.float64).to_scipy()
        assert (abs(A - B)).max() < 1e-12

    def test_todense(self, rng):
        A = random_csr(rng, 17, 23)
        Ad = CSR.from_scipy(A, dtype=jnp.float64).todense()
        np.testing.assert_allclose(np.asarray(Ad), A.toarray(), atol=1e-12)

    def test_csr_to_ell_device(self, rng):
        A = random_csr(rng, 33, 33, density=0.15)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        w = int(np.diff(A.indptr).max())
        E = jax.jit(lambda B: B.to_ell(w + 2))(Ac)
        assert (abs(E.to_scipy() - A)).max() < 1e-12

    def test_diagonal(self, rng):
        A = random_csr(rng, 40, 40, density=0.2) + sp.eye(40) * 3.0
        A = A.tocsr()
        d = CSR.from_scipy(A, dtype=jnp.float64).diagonal()
        np.testing.assert_allclose(np.asarray(d), A.diagonal(), atol=1e-12)

    def test_triu_tril(self, rng):
        A = random_csr(rng, 25, 25, density=0.3)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        np.testing.assert_allclose(
            np.asarray(Ac.triu(1).todense()), sp.triu(A, 1).toarray(), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(Ac.tril(0).todense()), sp.tril(A, 0).toarray(), atol=1e-12
        )

    def test_scale_rows_cols(self, rng):
        A = random_csr(rng, 12, 15)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        s = rng.randn(12)
        t = rng.randn(15)
        np.testing.assert_allclose(
            np.asarray(Ac.scale_rows(jnp.asarray(s)).todense()),
            sp.diags(s) @ A.toarray(),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(Ac.scale_cols(jnp.asarray(t)).todense()),
            A.toarray() @ sp.diags(t),
            atol=1e-12,
        )


class TestProducts:
    @pytest.mark.parametrize("fmt", ["csr", "ell"])
    def test_spmv(self, rng, fmt):
        A = random_csr(rng, 64, 48, density=0.15)
        x = rng.randn(48)
        Ad = (
            CSR.from_scipy(A, dtype=jnp.float64)
            if fmt == "csr"
            else ELL.from_scipy(A, dtype=jnp.float64)
        )
        y = jax.jit(matmul.spmv)(Ad, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x, atol=1e-12)

    @pytest.mark.parametrize("fmt", ["csr", "ell"])
    def test_spmv_t(self, rng, fmt):
        A = random_csr(rng, 64, 48, density=0.15)
        x = rng.randn(64)
        Ad = (
            CSR.from_scipy(A, dtype=jnp.float64)
            if fmt == "csr"
            else ELL.from_scipy(A, dtype=jnp.float64)
        )
        y = jax.jit(matmul.spmv_t)(Ad, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A.T @ x, atol=1e-12)

    @pytest.mark.parametrize("fmt", ["csr", "ell"])
    def test_spmm(self, rng, fmt):
        A = random_csr(rng, 40, 30, density=0.2)
        X = rng.randn(30, 7)
        Ad = (
            CSR.from_scipy(A, dtype=jnp.float64)
            if fmt == "csr"
            else ELL.from_scipy(A, dtype=jnp.float64)
        )
        Y = jax.jit(matmul.spmm)(Ad, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(Y), A @ X, atol=1e-12)

    @pytest.mark.parametrize("fmt", ["csr", "ell"])
    def test_spmm_t(self, rng, fmt):
        A = random_csr(rng, 40, 30, density=0.2)
        X = rng.randn(40, 5)
        Ad = (
            CSR.from_scipy(A, dtype=jnp.float64)
            if fmt == "csr"
            else ELL.from_scipy(A, dtype=jnp.float64)
        )
        Y = jax.jit(matmul.spmm_t)(Ad, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(Y), A.T @ X, atol=1e-12)

    def test_transpose(self, rng):
        A = random_csr(rng, 31, 44, density=0.15)
        At = jax.jit(matmul.transpose)(CSR.from_scipy(A, dtype=jnp.float64))
        assert (abs(At.to_scipy() - A.T)).max() < 1e-12

    def test_spgemm_random(self, rng):
        A = random_csr(rng, 25, 30, density=0.15)
        B = random_csr(rng, 30, 20, density=0.15)
        C = A @ B
        wb = int(np.diff(B.tocsr().indptr).max())
        Cd = jax.jit(
            lambda a, b: matmul.spgemm(a, b, nnz_out=1024, b_width=wb)
        )(CSR.from_scipy(A, dtype=jnp.float64), CSR.from_scipy(B, dtype=jnp.float64))
        np.testing.assert_allclose(np.asarray(Cd.todense()), C.toarray(), atol=1e-12)

    def test_spgemm_poisson_rap(self, rng):
        # Galerkin product on 1D Poisson with aggregation-style P
        n = 64
        A = poisson1d(n)
        # piecewise-constant aggregation P: groups of 4
        k = n // 4
        P = sp.csr_matrix(
            (np.ones(n), (np.arange(n), np.arange(n) // 4)), shape=(n, k)
        )
        AH = (P.T @ A @ P).tocsr()
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = CSR.from_scipy(P, dtype=jnp.float64)
        AP = matmul.spgemm(Ad, Pd, nnz_out=512, b_width=1)
        Pt = matmul.transpose(Pd)
        AHd = matmul.spgemm(Pt, AP, nnz_out=512, b_width=3)
        np.testing.assert_allclose(np.asarray(AHd.todense()), AH.toarray(), atol=1e-12)

    def test_rap_dense(self, rng):
        n = 64
        A = poisson1d(n)
        k = n // 4
        P = sp.random(n, k, density=0.1, format="csr", random_state=rng)
        AH = (P.T @ A @ P).toarray()
        got = jax.jit(matmul.rap_dense)(
            CSR.from_scipy(A, dtype=jnp.float64),
            jnp.asarray(P.toarray()),
        )
        np.testing.assert_allclose(np.asarray(got), AH, atol=1e-10)

    def test_spgemm_overflow_flag(self, rng):
        # nnz_out smaller than the true product nnz must be reported, never
        # silently truncated (VERDICT r1: wrong coarse operator with no error)
        A = random_csr(rng, 25, 30, density=0.3)
        B = random_csr(rng, 30, 20, density=0.3)
        true_nnz = (A @ B).nnz
        assert true_nnz > 16
        wb = int(np.diff(B.tocsr().indptr).max())
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Bd = CSR.from_scipy(B, dtype=jnp.float64)
        _, ov = matmul.spgemm(Ad, Bd, nnz_out=16, b_width=wb, return_overflow=True)
        assert bool(ov)
        Cd, ov = matmul.spgemm(
            Ad, Bd, nnz_out=true_nnz, b_width=wb, return_overflow=True
        )
        assert not bool(ov)
        np.testing.assert_allclose(np.asarray(Cd.todense()), (A @ B).toarray(), atol=1e-12)

    def test_rap_overflow_flag(self, rng):
        n = 64
        A = poisson1d(n)
        k = n // 4
        P = sp.csr_matrix(
            (np.ones(n), (np.arange(n), np.arange(n) // 4)), shape=(n, k)
        )
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = CSR.from_scipy(P, dtype=jnp.float64)
        _, ov = matmul.rap(Ad, Pd, nnz_ap=512, nnz_out=8, a_width=3, p_width=1,
                           return_overflow=True)
        assert bool(ov)
        AH, ov = matmul.rap(Ad, Pd, nnz_ap=512, nnz_out=512, a_width=3, p_width=1,
                            return_overflow=True)
        assert not bool(ov)
        np.testing.assert_allclose(
            np.asarray(AH.todense()), (P.T @ A @ P).toarray(), atol=1e-12
        )

    def test_rap_fused_random(self, rng):
        # fused single-expand RAP must match scipy P^T A P exactly in pattern
        # and values (f64), including a smoothed (multi-entry-per-row) P
        n, k = 60, 12
        A = random_csr(rng, n, n, density=0.15)
        P = random_csr(rng, n, k, density=0.3)
        wp = int(np.diff(P.indptr).max())
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = CSR.from_scipy(P, dtype=jnp.float64)
        true = (P.T @ A @ P).tocsr()
        AH, ov = matmul.rap_fused(
            Ad, Pd, k=k, nnz_out=int(true.nnz) + 8, p_width=wp,
            return_overflow=True,
        )
        assert not bool(ov)
        np.testing.assert_allclose(
            np.asarray(AH.todense()), true.toarray(), atol=1e-12
        )

    def test_rap_fused_overflow_and_agreement_with_rap(self, rng):
        n = 64
        A = poisson1d(n)
        kk = n // 4
        P = sp.csr_matrix(
            (np.ones(n), (np.arange(n), np.arange(n) // 4)), shape=(n, kk)
        )
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = CSR.from_scipy(P, dtype=jnp.float64)
        _, ov = matmul.rap_fused(Ad, Pd, k=kk, nnz_out=8, p_width=1,
                                 return_overflow=True)
        assert bool(ov)
        AH, ov = matmul.rap_fused(Ad, Pd, k=kk, nnz_out=128, p_width=1,
                                  return_overflow=True)
        assert not bool(ov)
        np.testing.assert_allclose(
            np.asarray(AH.todense()), (P.T @ A @ P).toarray(), atol=1e-12
        )

    def test_rap_fused_grad(self, rng):
        # setup products must stay differentiable w.r.t. A and P values
        n, k = 20, 5
        A = random_csr(rng, n, n, density=0.2)
        P = random_csr(rng, n, k, density=0.4)
        wp = int(np.diff(P.indptr).max())
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        Pd = CSR.from_scipy(P, dtype=jnp.float64)

        def f(pdata):
            AH = matmul.rap_fused(
                Ad, Pd.with_data(pdata), k=k, nnz_out=64, p_width=wp
            )
            return jnp.sum(AH.data ** 2)

        g = jax.grad(f)(Pd.data)
        eps = 1e-6
        d = np.zeros_like(np.asarray(Pd.data))
        d[0] = eps
        fd = (f(Pd.data + d) - f(Pd.data - d)) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-5, atol=1e-8)

    def test_coalesce_duplicates(self):
        # duplicate coordinates must sum
        row = jnp.array([0, 1, 0, 3, 1, 3], dtype=jnp.int32)  # 3 = sentinel pad
        col = jnp.array([1, 2, 1, 0, 2, 0], dtype=jnp.int32)
        val = jnp.array([1.0, 2.0, 3.0, 0.0, 4.0, 0.0])
        C = matmul.coalesce(val, row, col, (3, 4), nnz_out=8)
        D = np.asarray(C.todense())
        expect = np.zeros((3, 4))
        expect[0, 1] = 4.0
        expect[1, 2] = 6.0
        np.testing.assert_allclose(D, expect)

    def test_spmv_grad(self, rng):
        # differentiability w.r.t. values (needed by the Adam training path)
        A = random_csr(rng, 20, 20, density=0.3)
        Ad = CSR.from_scipy(A, dtype=jnp.float64)
        x = jnp.asarray(rng.randn(20))

        def f(data):
            return jnp.sum(matmul.spmv(Ad.with_data(data), x) ** 2)

        g = jax.grad(f)(Ad.data)
        # finite-difference check on a few entries
        eps = 1e-6
        for i in [0, 3, 7]:
            d2 = Ad.data.at[i].add(eps)
            fd = (f(d2) - f(Ad.data)) / eps
            np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-6)
