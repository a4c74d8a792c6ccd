"""DIA (diagonal) sparse format: the TPU-native layout for stencil matrices.

TPUs process stencils as shifts + fused multiply-adds, not gathers.  A
matrix with D stored diagonals does SpMV as

    y = sum_d  diag_d  *  x[off_d : off_d + n]        (static slices)

— one fused elementwise pass, no scatter/gather, HBM-roofline-bound.  FD
and structured-FEM operators (1D/2D/3D Poisson, anisotropic diffusion on
regular meshes — the reference's structured problem families,
ns/model/data.py:246-298,435-544) have a handful of diagonals; banded
unstructured matrices can be DIA-ized after bandwidth-reducing (RCM)
reordering.  ``auto_format`` picks DIA when the diagonal count is small and
falls back to ELL otherwise.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR, ELL


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "shape"],
)
@dataclasses.dataclass(frozen=True)
class DIA:
    """Diagonal storage: ``data[d, i] = A[i, i + offsets[d]]`` (0 where the
    diagonal runs off the matrix)."""

    data: jax.Array  # (D, n)
    offsets: Tuple[int, ...]
    shape: Tuple[int, int]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def data2d(self):
        """(D, n) view of the diagonals; undoes the pre-blocked
        (D, n/128, 128) layout of ``pallas_kernels.blocked_dia`` (relayout
        copy — fine off the hot path)."""
        if self.data.ndim == 3:
            return self.data.reshape(len(self.offsets), self.shape[0])
        return self.data

    @staticmethod
    def from_scipy(A, dtype=jnp.float32) -> "DIA":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n, m = A.shape
        assert n == m, "DIA requires square matrices"
        if np.dtype(dtype) == np.float32:
            # C++ extraction fast path (mlamg_tpu/native)
            from mlamg_tpu import native

            if native.available():
                offs, data = native.csr_to_dia(A)
                return DIA(jnp.asarray(data), tuple(int(o) for o in offs), (n, m))
        coo = A.tocoo()
        offs = np.unique(coo.col - coo.row)
        data = np.zeros((len(offs), n), dtype=np.dtype(dtype))
        off_index = {int(o): d for d, o in enumerate(offs)}
        d_idx = np.array([off_index[int(o)] for o in (coo.col - coo.row)])
        data[d_idx, coo.row] = coo.data
        return DIA(jnp.asarray(data), tuple(int(o) for o in offs), (n, m))

    @staticmethod
    def num_diagonals(A_scipy) -> int:
        coo = A_scipy.tocoo()
        return len(np.unique(coo.col - coo.row))

    def to_scipy(self):
        import scipy.sparse as sp

        n, _ = self.shape
        rows, cols, vals = [], [], []
        data = np.asarray(self.data2d)
        for d, off in enumerate(self.offsets):
            lo = max(0, -off)
            hi = min(n, n - off)
            r = np.arange(lo, hi)
            rows.append(r)
            cols.append(r + off)
            vals.append(data[d, lo:hi])
        return sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape,
        ).tocsr()

    def todense(self):
        return jnp.asarray(self.to_scipy().toarray())

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.data2d[self.offsets.index(0)]
        return jnp.zeros((self.shape[0],), self.data.dtype)


def dia_spmv(A: DIA, x: jax.Array) -> jax.Array:
    """y = A @ x as D static shifted FMAs (no gather).

    Offsets are static metadata, so every slice below is a *static*
    lax.slice — XLA fuses the whole sum into one streaming pass.  (With
    dynamic_slice the fusion breaks and this runs ~40x slower.)
    """
    n = A.shape[0]
    data = A.data2d
    max_neg = max((-o for o in A.offsets if o < 0), default=0)
    max_pos = max((o for o in A.offsets if o > 0), default=0)
    xp = jnp.pad(x, (max_neg, max_pos))
    y = None
    for d, off in enumerate(A.offsets):
        xs = xp[max_neg + off : max_neg + off + n]
        y = data[d] * xs if y is None else y + data[d] * xs
    return y if y is not None else jnp.zeros_like(x)


def dia_spmv_t(A: DIA, x: jax.Array) -> jax.Array:
    """y = A.T @ x — the transpose of a DIA matrix is DIA with negated
    offsets and shifted diagonals."""
    n = A.shape[0]
    max_neg = max((-o for o in A.offsets if o < 0), default=0)
    max_pos = max((o for o in A.offsets if o > 0), default=0)
    # (A^T)[i, i - off] diag: value A[i+?]... use: y[j] = sum_i A[i,j] x[i]
    # column j receives from row j - off on diagonal off: val data[d, j-off]
    xp = jnp.pad(x, (max_pos, max_neg))
    dp = jnp.pad(A.data2d, ((0, 0), (max_pos, max_neg)))
    y = jnp.zeros_like(x)
    for d, off in enumerate(A.offsets):
        # shift both the diagonal values and x by -off (static slices)
        xs = xp[max_pos - off : max_pos - off + n]
        vs = dp[d, max_pos - off : max_pos - off + n]
        y = y + vs * xs
    return y


def dia_spmm(A: DIA, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X (n, k): shifted FMAs on 2-D slabs."""
    n = A.shape[0]
    max_neg = max((-o for o in A.offsets if o < 0), default=0)
    max_pos = max((o for o in A.offsets if o > 0), default=0)
    Xp = jnp.pad(X, ((max_neg, max_pos), (0, 0)))
    data = A.data2d
    Y = jnp.zeros_like(X)
    for d, off in enumerate(A.offsets):
        Xs = Xp[max_neg + off : max_neg + off + n, :]
        Y = Y + data[d][:, None] * Xs
    return Y


def dia_jacobi_operator(A: DIA, Dinv: jax.Array, omega: float) -> DIA | None:
    """M = I - omega * diag(Dinv) @ A as a DIA sharing A's offsets.

    One weighted-Jacobi sweep is then the affine map x' = M x + c with
    c = omega * Dinv * b — a single fused pass through
    ``pallas_kernels.dia_spmv_pallas(M, x, c=c)``.  Returns ``None`` when
    the main diagonal is not stored (cannot add I in place).  Preserves
    A's (blocked or flat) data layout.
    """
    if 0 not in A.offsets:
        return None
    d_idx = A.offsets.index(0)
    if A.data.ndim == 3:
        scale = Dinv.reshape(A.data.shape[1], A.data.shape[2])
        data = -omega * scale[None, :, :] * A.data
        data = data.at[d_idx].add(1.0)
    else:
        data = -omega * Dinv[None, :] * A.data
        data = data.at[d_idx].add(1.0)
    return DIA(data, A.offsets, A.shape)


def auto_format(A_scipy, max_diagonals: int = 32, dtype=jnp.float32):
    """Pick the fastest container for this matrix's structure:
    DIA for few-diagonal (stencil) matrices, ELL otherwise."""
    if A_scipy.shape[0] == A_scipy.shape[1] and DIA.num_diagonals(A_scipy) <= max_diagonals:
        return DIA.from_scipy(A_scipy, dtype=dtype)
    return ELL.from_scipy(A_scipy, dtype=dtype)
