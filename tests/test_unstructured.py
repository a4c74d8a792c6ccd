"""WindowedELL (Pallas unstructured SpMV) vs scipy oracles.

The TPU fast path for the reference's random-hull FEM problem family
(ns/model/data.py:416-433); runs here in the Pallas interpreter on CPU.
"""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

from mlamg_tpu.ops.unstructured import WindowedELL, well_spmv_pallas, rcm_spmv_setup
from mlamg_tpu.ops import matmul


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def fem_matrix(n_target=800, seed=3):
    from mlamg_tpu.data import Grid

    g = Grid.random_2d_unstructured(n_target, seed=seed)
    return sp.csr_matrix(g.A).astype(np.float32)


class TestWindowedELL:
    @pytest.mark.parametrize("static_chunks", [True, False])
    def test_matches_scipy_fem(self, rng, static_chunks):
        A = fem_matrix()
        from mlamg_tpu import native

        perm = native.rcm_ordering(A)
        Ap = A[perm][:, perm].tocsr()
        W = WindowedELL.from_scipy(Ap)
        x = rng.randn(Ap.shape[0]).astype(np.float32)
        y = well_spmv_pallas(
            W, jnp.asarray(x), static_chunks=static_chunks, interpret=True
        )
        ref = Ap @ x
        np.testing.assert_allclose(
            np.asarray(y), ref, atol=1e-5 * np.abs(ref).max()
        )

    def test_affine_form(self, rng):
        A = fem_matrix(seed=5)
        from mlamg_tpu import native

        perm = native.rcm_ordering(A)
        Ap = A[perm][:, perm].tocsr()
        W = WindowedELL.from_scipy(Ap)
        n = Ap.shape[0]
        x = rng.randn(n).astype(np.float32)
        c = rng.randn(n).astype(np.float32)
        y = well_spmv_pallas(
            W, jnp.asarray(x), c=jnp.asarray(c), alpha=-1.0, interpret=True
        )
        ref = c - Ap @ x
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5 * np.abs(ref).max())

    def test_banded_random(self, rng):
        # non-FEM banded matrix with uneven row degrees
        n = 700
        A = sp.random(n, n, density=0.01, format="lil", random_state=rng)
        A.setdiag(1.0)
        A = sp.csr_matrix(A)
        # restrict to a band so the window invariant holds
        coo = A.tocoo()
        keep = np.abs(coo.row - coo.col) <= 60
        A = sp.csr_matrix(
            (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
        )
        W = WindowedELL.from_scipy(A, dtype=jnp.float32)
        x = rng.randn(n).astype(np.float32)
        y = well_spmv_pallas(W, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), A @ x, atol=1e-5 * max(1.0, np.abs(A @ x).max())
        )

    def test_rcm_setup_roundtrip(self, rng):
        A = fem_matrix(seed=9)
        perm, W = rcm_spmv_setup(A)
        n = A.shape[0]
        x = rng.randn(n).astype(np.float32)
        y_perm = well_spmv_pallas(W, jnp.asarray(x[perm]), interpret=True)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        y = np.asarray(y_perm)[inv]
        ref = A @ x
        np.testing.assert_allclose(y, ref, atol=1e-5 * np.abs(ref).max())

    def test_spmv_dispatch(self, rng):
        A = fem_matrix(seed=11)
        from mlamg_tpu import native

        perm = native.rcm_ordering(A)
        Ap = A[perm][:, perm].tocsr()
        W = WindowedELL.from_scipy(Ap)
        x = rng.randn(Ap.shape[0]).astype(np.float32)
        y = matmul.spmv(W, jnp.asarray(x))
        ref = Ap @ x
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5 * np.abs(ref).max())
