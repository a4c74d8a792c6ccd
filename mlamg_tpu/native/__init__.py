"""ctypes bindings for the C++ preprocessing runtime (native/mlamg_native.cpp).

Compiled on demand (``make -C native``) and cached; every entry point has a
numpy fallback so the framework works without a toolchain.  Use
``mlamg_tpu.native.available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libmlamg_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(so)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C")

    lib.csr_to_ell.restype = ctypes.c_int
    lib.csr_to_ell.argtypes = [i64, p_i64, p_i32, p_f32, i64, p_f32, p_i32]
    lib.count_diagonals.restype = i64
    lib.count_diagonals.argtypes = [i64, p_i64, p_i32]
    lib.csr_to_dia.restype = i64
    lib.csr_to_dia.argtypes = [i64, p_i64, p_i32, p_f32, p_i64, p_f32]
    lib.rcm_ordering.restype = None
    lib.rcm_ordering.argtypes = [i64, p_i64, p_i32, p_i32]
    lib.greedy_coloring.restype = i32
    lib.greedy_coloring.argtypes = [i64, p_i64, p_i32, p_i32]
    lib.required_halo.restype = i64
    lib.required_halo.argtypes = [i64, p_i64, p_i32, i64]
    lib.bellman_ford.restype = None
    lib.bellman_ford.argtypes = [i64, p_i64, p_i32, p_f32, p_i32, i64, p_f32, p_i32]
    lib.fem_p1_assemble.restype = None
    lib.fem_p1_assemble.argtypes = [i64, p_f64, p_i64, p_f64, p_i64, p_i64, p_f64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _csr_parts(A):
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    A.sort_indices()
    return (
        np.ascontiguousarray(A.indptr, np.int64),
        np.ascontiguousarray(A.indices, np.int32),
        np.ascontiguousarray(A.data, np.float32),
        A.shape[0],
    )


def csr_to_ell(A, width: int | None = None):
    """(data (n, w) f32, cols (n, w) i32)."""
    indptr, indices, data, n = _csr_parts(A)
    deg = np.diff(indptr)
    w = int(deg.max()) if width is None else int(width)
    lib = _load()
    out_d = np.empty((n, w), np.float32)
    out_c = np.empty((n, w), np.int32)
    if lib is not None:
        rc = lib.csr_to_ell(n, indptr, indices, data, w, out_d, out_c)
        if rc != 0:
            raise ValueError(f"row degree exceeds width {w}")
        return out_d, out_c
    # numpy fallback
    if deg.max() > w:
        raise ValueError(f"row degree exceeds width {w}")
    out_d[:] = 0
    out_c[:] = 0
    rows = np.repeat(np.arange(n), deg)
    offs = np.arange(len(indices)) - np.repeat(indptr[:-1], deg)
    out_d[rows, offs] = data
    out_c[rows, offs] = indices
    return out_d, out_c


def count_diagonals(A) -> int:
    indptr, indices, _, n = _csr_parts(A)
    lib = _load()
    if lib is not None:
        return int(lib.count_diagonals(n, indptr, indices))
    import scipy.sparse as sp

    coo = sp.csr_matrix(A).tocoo()
    return len(np.unique(coo.col - coo.row))


def csr_to_dia(A):
    """(offsets (D,) i64, data (D, n) f32)."""
    indptr, indices, data, n = _csr_parts(A)
    lib = _load()
    if lib is not None:
        cap = int(lib.count_diagonals(n, indptr, indices))
        offsets = np.empty(cap, np.int64)
        out = np.empty((cap, n), np.float32)
        d = int(lib.csr_to_dia(n, indptr, indices, data, offsets, out.reshape(-1)))
        return offsets[:d], out[:d]
    import scipy.sparse as sp

    coo = sp.csr_matrix(A).tocoo()
    offs = np.unique(coo.col - coo.row)
    out = np.zeros((len(offs), n), np.float32)
    idx = {int(o): d for d, o in enumerate(offs)}
    for r, c, v in zip(coo.row, coo.col, coo.data):
        out[idx[int(c - r)], r] = v
    return offs.astype(np.int64), out


def rcm_ordering(A) -> np.ndarray:
    indptr, indices, _, n = _csr_parts(A)
    lib = _load()
    if lib is not None:
        perm = np.empty(n, np.int32)
        lib.rcm_ordering(n, indptr, indices, perm)
        return perm
    import scipy.sparse.csgraph as csgraph
    import scipy.sparse as sp

    return np.asarray(
        csgraph.reverse_cuthill_mckee(sp.csr_matrix(A), symmetric_mode=True),
        np.int32,
    )


def greedy_coloring(A):
    """(colors (n,) i32, num_colors)."""
    indptr, indices, _, n = _csr_parts(A)
    lib = _load()
    if lib is not None:
        colors = np.empty(n, np.int32)
        nc = int(lib.greedy_coloring(n, indptr, indices, colors))
        return colors, nc
    from mlamg_tpu.mg.smoothers import greedy_coloring as py_coloring

    colors = py_coloring(A)
    return colors, int(colors.max()) + 1


def required_halo(A, n_loc: int) -> int:
    indptr, indices, _, n = _csr_parts(A)
    lib = _load()
    if lib is not None:
        return int(lib.required_halo(n, indptr, indices, n_loc))
    import scipy.sparse as sp

    coo = sp.csr_matrix(A).tocoo()
    lo = (coo.row // n_loc) * n_loc
    halo = np.maximum(lo - coo.col, coo.col - (lo + n_loc) + 1)
    return int(max(0, halo.max())) if len(halo) else 0


def bellman_ford(A, centers):
    """(dist (n,) f32, nearest (n,) i32) — host oracle."""
    indptr, indices, data, n = _csr_parts(A)
    centers = np.ascontiguousarray(centers, np.int32)
    lib = _load()
    dist = np.full(n, np.inf, np.float32)
    nearest = np.full(n, -1, np.int32)
    if lib is not None:
        lib.bellman_ford(n, indptr, indices, data, centers, len(centers), dist, nearest)
        return dist, nearest
    # numpy fallback: repeated relaxation
    dist[centers] = 0.0
    nearest[centers] = centers
    import scipy.sparse as sp

    coo = sp.csr_matrix(A).tocoo()
    changed = True
    while changed:
        cand = dist[coo.row] + coo.data
        better = cand < dist[coo.col]
        changed = bool(better.any())
        if changed:
            # sequential resolution for ties, mirror C++ sweep order
            for r, c, w in zip(coo.row[better], coo.col[better], coo.data[better]):
                if dist[r] + w < dist[c]:
                    dist[c] = dist[r] + w
                    nearest[c] = nearest[r]
    return dist, nearest


def fem_p1_assemble(vertices, triangles, kappa_tensors):
    """COO triplets (rows, cols, vals) for the P1 stiffness matrix; kappa is
    (n_tri, 2, 2)."""
    v = np.ascontiguousarray(np.asarray(vertices)[:, :2], np.float64)
    t = np.ascontiguousarray(triangles, np.int64)
    k = np.ascontiguousarray(kappa_tensors, np.float64)
    n_tri = len(t)
    lib = _load()
    if lib is not None:
        rows = np.empty(9 * n_tri, np.int64)
        cols = np.empty(9 * n_tri, np.int64)
        vals = np.empty(9 * n_tri, np.float64)
        lib.fem_p1_assemble(n_tri, v.reshape(-1), t.reshape(-1), k.reshape(-1),
                            rows, cols, vals)
        return rows, cols, vals
    # numpy fallback: same vectorized local assembly as data.fem.gradgradform,
    # but with the per-triangle kappa tensors this entry point takes.
    p0, p1, p2 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    d1 = p1 - p0
    d2 = p2 - p0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(det)
    inv_det = 1.0 / det
    g1 = np.column_stack([d2[:, 1], -d2[:, 0]]) * inv_det[:, None]
    g2 = np.column_stack([-d1[:, 1], d1[:, 0]]) * inv_det[:, None]
    g0 = -(g1 + g2)
    G = np.stack([g0, g1, g2], axis=1)  # (m, 3, 2)
    KG = np.einsum("mab,mjb->mja", k, G)
    local = np.einsum("mia,mja->mij", G, KG) * area[:, None, None]
    rows = np.repeat(t, 3, axis=1).ravel()
    cols = np.tile(t, (1, 3)).ravel()
    return rows.astype(np.int64), cols.astype(np.int64), local.ravel()
