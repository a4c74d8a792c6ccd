"""BSR (block sparse row) container — fixed-size dense blocks in an
ELL-style fixed-width layout.

Role of the block structure PETSc exploits for the velocity block of the
reference's Navier-Stokes systems (vector-valued P2 dofs; the reference
leaves this to PETSc MatBSR, demos/unsteady-cylflow.py:67-92): a 2-D/3-D
velocity operator couples bs x bs dof blocks per mesh-vertex pair, so the
natural unit of sparse work is a small dense block, not a scalar.

TPU-native layout: block rows padded to a fixed width (sentinel block
column = number of block columns, value 0 — consistent with the repo's
static-shape padding convention, CLAUDE.md), data as (nbr, w, bs, bs).
The SpMV gathers x blocks once per slot and contracts with one einsum —
a (nbr*w) batch of bs x bs matmuls that XLA maps onto the MXU/VPU in a
single fused pass, with none of the scalar-gather overhead a CSR SpMV
pays on the same operator (bs^2 values share one index).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "col"],
    meta_fields=["shape", "bs"],
)
@dataclasses.dataclass(frozen=True)
class BSR:
    """Fixed-width block-ELL sparse matrix.

    ``data``: (nbr, w, bs, bs) blocks; ``col``: (nbr, w) int32 block-column
    ids, sentinel = nbc for padding slots (their blocks are zero).
    ``shape`` is the scalar (m, n); ``bs`` the block size.
    """

    data: jax.Array
    col: jax.Array
    shape: Tuple[int, int]
    bs: int

    @property
    def nbr(self) -> int:
        return self.shape[0] // self.bs

    @property
    def nbc(self) -> int:
        return self.shape[1] // self.bs

    @property
    def width(self) -> int:
        return self.col.shape[1]

    @property
    def mask(self) -> jax.Array:
        return self.col < self.nbc

    @staticmethod
    def from_scipy(A, bs: int, dtype=jnp.float32) -> "BSR":
        """Convert any scipy sparse matrix; scalar dims must divide bs."""
        import scipy.sparse as sp

        m, n = A.shape
        if m % bs or n % bs:
            raise ValueError(f"shape {A.shape} not divisible by bs={bs}")
        Ab = sp.bsr_matrix(A.tocsr(), blocksize=(bs, bs))
        Ab.sort_indices()
        nbr, nbc = m // bs, n // bs
        widths = np.diff(Ab.indptr)
        w = max(int(widths.max(initial=1)), 1)
        col = np.full((nbr, w), nbc, np.int32)
        data = np.zeros((nbr, w, bs, bs), np.float32)
        for i in range(nbr):
            s, e = Ab.indptr[i], Ab.indptr[i + 1]
            col[i, : e - s] = Ab.indices[s:e]
            data[i, : e - s] = Ab.data[s:e]
        return BSR(
            jnp.asarray(data, dtype), jnp.asarray(col), (m, n), bs
        )

    def to_scipy(self):
        import scipy.sparse as sp

        col = np.asarray(self.col)
        data = np.asarray(self.data, np.float64)
        live = col < self.nbc
        rows_b, slots = np.nonzero(live)
        cols_b = col[live]
        bs = self.bs
        blocks = data[rows_b, slots]  # (nnzb, bs, bs)
        r = (rows_b[:, None, None] * bs + np.arange(bs)[None, :, None]
             + np.zeros((1, 1, bs), int)).ravel()
        c = (cols_b[:, None, None] * bs + np.arange(bs)[None, None, :]
             + np.zeros((1, bs, 1), int)).ravel()
        return sp.coo_matrix(
            (blocks.ravel(), (r, c)), shape=self.shape
        ).tocsr()


@jax.jit
def bsr_spmv(A: BSR, x: jax.Array) -> jax.Array:
    """y = A @ x: one gather of x blocks + one batched bs x bs contraction."""
    nbc, bs = A.nbc, A.bs
    xb = x.reshape(nbc, bs)
    # zero pad-block at index nbc so sentinel slots contribute nothing
    xb = jnp.concatenate([xb, jnp.zeros((1, bs), x.dtype)], axis=0)
    g = xb[A.col]  # (nbr, w, bs)
    y = jnp.einsum("rwij,rwj->ri", A.data, g)
    return y.reshape(A.shape[0])


@jax.jit
def bsr_spmv_t(A: BSR, x: jax.Array) -> jax.Array:
    """y = A.T @ x via segment-sum over block slots (setup/occasional use)."""
    nbr, nbc, bs = A.nbr, A.nbc, A.bs
    xb = x.reshape(nbr, bs)
    # contributions: for slot (r, w): data[r,w].T @ xb[r] into block col[r,w]
    contrib = jnp.einsum("rwij,ri->rwj", A.data, xb)  # (nbr, w, bs)
    flat_col = jnp.where(A.mask, A.col, nbc).reshape(-1)
    out = jax.ops.segment_sum(
        contrib.reshape(-1, bs), flat_col, num_segments=nbc + 1
    )[:nbc]
    return out.reshape(A.shape[1])
