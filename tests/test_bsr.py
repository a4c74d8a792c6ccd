"""BSR container oracle tests (ops/bsr.py; role of PETSc MatBSR for the
velocity block, reference demos/unsteady-cylflow.py:67-92)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from mlamg_tpu.ops import BSR, bsr_spmv, bsr_spmv_t, matmul


def _block_operator(nb=37, bs=2, seed=0, nbc=None):
    rng = np.random.RandomState(seed)
    nbc = nbc or nb
    # random block pattern with variable row widths incl. an empty-ish row
    rows, cols, vals = [], [], []
    for i in range(nb):
        deg = rng.randint(1, 6)
        for j in rng.choice(nbc, size=deg, replace=False):
            B = rng.randn(bs, bs)
            for a in range(bs):
                for b in range(bs):
                    rows.append(i * bs + a)
                    cols.append(j * bs + b)
                    vals.append(B[a, b])
    return sp.coo_matrix(
        (vals, (rows, cols)), shape=(nb * bs, nbc * bs)
    ).tocsr()


@pytest.mark.parametrize("bs", [2, 3])
def test_bsr_roundtrip(bs):
    A = _block_operator(bs=bs, seed=bs)
    Ab = BSR.from_scipy(A, bs=bs)
    assert Ab.bs == bs
    err = abs(Ab.to_scipy() - A).max()
    assert err < 1e-6


@pytest.mark.parametrize("bs", [2, 3])
def test_bsr_spmv_oracle(bs):
    A = _block_operator(nb=29, bs=bs, seed=10 + bs, nbc=31)
    Ab = BSR.from_scipy(A, bs=bs)
    x = np.random.RandomState(1).randn(A.shape[1]).astype(np.float32)
    y = np.asarray(bsr_spmv(Ab, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=2e-5)
    # generic dispatch
    y2 = np.asarray(matmul.spmv(Ab, jnp.asarray(x)))
    np.testing.assert_allclose(y2, y, rtol=0, atol=0)


def test_bsr_spmv_t_oracle():
    A = _block_operator(nb=23, bs=2, seed=3, nbc=19)
    Ab = BSR.from_scipy(A, bs=2)
    x = np.random.RandomState(2).randn(A.shape[0]).astype(np.float32)
    y = np.asarray(bsr_spmv_t(Ab, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.T @ x, rtol=2e-5, atol=2e-5)
