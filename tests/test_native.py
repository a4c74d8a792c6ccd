"""Tests for the C++ preprocessing runtime (vs scipy/python oracles)."""

import numpy as np
import scipy.sparse as sp
import pytest

from mlamg_tpu import native


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return sp.csr_matrix((sp.kron(I, T) + sp.kron(T, I)), dtype=np.float64).tocsr()


def test_native_library_builds():
    assert native.available(), "C++ runtime failed to build/load"


def test_csr_to_ell_matches_python(rng):
    A = sp.random(60, 60, density=0.1, format="csr", random_state=rng)
    d, c = native.csr_to_ell(A)
    # reconstruct and compare
    n, w = d.shape
    rows = np.repeat(np.arange(n), w)
    back = sp.coo_matrix((d.ravel(), (rows, c.ravel())), shape=A.shape).tocsr()
    back.eliminate_zeros()
    assert abs(back - sp.csr_matrix(A, dtype=np.float32)).max() < 1e-6


def test_count_diagonals():
    A = poisson2d(8)
    assert native.count_diagonals(A) == 5


def test_csr_to_dia_roundtrip():
    A = poisson2d(6)
    offs, data = native.csr_to_dia(A)
    assert list(offs) == [-6, -1, 0, 1, 6]
    n = A.shape[0]
    back = np.zeros((n, n), np.float32)
    for d, off in enumerate(offs):
        for i in range(n):
            j = i + off
            if 0 <= j < n:
                back[i, j] = data[d, i]
    np.testing.assert_allclose(back, A.toarray(), atol=1e-6)


def test_rcm_reduces_bandwidth(rng):
    A = sp.random(120, 120, density=0.05, format="csr", random_state=rng)
    A = A + A.T + sp.eye(120)
    A = sp.csr_matrix(A)
    perm = native.rcm_ordering(A)
    assert sorted(perm.tolist()) == list(range(120))
    coo = A.tocoo()
    bw0 = np.abs(coo.row - coo.col).max()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(120, dtype=np.int32)
    bw1 = np.abs(inv[coo.row] - inv[coo.col]).max()
    assert bw1 <= bw0


def test_coloring_valid(rng):
    A = poisson2d(8)
    colors, nc = native.greedy_coloring(A)
    coo = A.tocoo()
    off = coo.row != coo.col
    assert (colors[coo.row[off]] != colors[coo.col[off]]).all()
    assert nc <= 8


def test_required_halo():
    A = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(64, 64)).tocsr()
    assert native.required_halo(A, 8) == 1
    A2 = poisson2d(8)  # bandwidth 8
    assert native.required_halo(A2, 16) == 8


def test_bellman_ford_matches_dijkstra(rng):
    import scipy.sparse.csgraph as csgraph

    A = sp.random(50, 50, density=0.1, format="csr", random_state=rng)
    A.data = np.abs(A.data) + 0.1
    A = sp.csr_matrix(A + A.T)
    centers = np.array([1, 20, 40], np.int32)
    dist, nearest = native.bellman_ford(A, centers)
    ref = csgraph.dijkstra(sp.csr_matrix(A, dtype=np.float32), indices=centers, min_only=True)
    np.testing.assert_allclose(dist, ref, rtol=1e-5)


def test_fem_assemble_matches_python():
    from mlamg_tpu.data import fem

    v, e = fem.regular_triangle_mesh(6, 6)
    kappa = np.tile(np.eye(2), (len(e), 1, 1))
    rows, cols, vals = native.fem_p1_assemble(v, e, kappa)
    A_native = sp.coo_matrix((vals, (rows, cols)), shape=(len(v), len(v))).tocsr()
    A_py = fem.gradgradform(v, e)
    assert abs(A_native - A_py).max() < 1e-10


def test_fem_assemble_numpy_fallback(monkeypatch):
    # the pure-numpy path (native .so unavailable) must produce the same
    # triplets, including anisotropic per-triangle tensors
    from mlamg_tpu.data import fem

    v, e = fem.regular_triangle_mesh(5, 5)
    K = fem.anisotropic_kappa(0.1, 0.3)(0.0, 0.0)
    kappa = np.tile(K, (len(e), 1, 1))
    ref_rows, ref_cols, ref_vals = native.fem_p1_assemble(v, e, kappa)
    monkeypatch.setattr(native, "_load", lambda: None)
    rows, cols, vals = native.fem_p1_assemble(v, e, kappa)
    A_ref = sp.coo_matrix((ref_vals, (ref_rows, ref_cols)), shape=(len(v),) * 2)
    A_fb = sp.coo_matrix((vals, (rows, cols)), shape=(len(v),) * 2)
    assert abs((A_ref - A_fb).tocsr()).max() < 1e-10
