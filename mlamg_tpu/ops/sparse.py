"""Static-shape sparse matrix containers for TPU.

Design notes
------------
XLA traces every jitted program once per shape signature, so all containers
here carry a *static* padded capacity (``nnz_pad`` / ``ell_width``) alongside
device arrays.  Padding follows one convention everywhere:

- padded COO/CSR entries have ``row == shape[0]`` (an out-of-range sentinel
  that JAX segment ops drop silently), ``col == 0`` and ``data == 0``;
- padded ELL slots have ``col == 0`` and ``data == 0`` (contributing
  ``0 * x[0]`` to any product).

The canonical device container is :class:`CSR` — really a *row-sorted COO
with an indptr*, which gives O(1) access to whichever view an op needs:
``row`` for segment reductions, ``indptr`` for row slicing, plain COO for
sort-based algebra.  :class:`ELL` is the bandwidth-optimal layout for the
SpMV hot path (every row padded to a fixed width; the gather+row-sum maps
onto the VPU with fully static shapes).

Capability parity: these containers play the role of the reference's
``ns/lib/sparse.py`` (scipy<->torch conversion, diagonal/triangular
extraction; reference ns/lib/sparse.py:8-106) and the torch_sparse-backed
``ns/lib/sparse_tensor.py`` wrappers (reference ns/lib/sparse_tensor.py:9-59),
re-designed for static shapes instead of dynamic nnz.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


def _as_shape(shape) -> Tuple[int, int]:
    s = tuple(int(v) for v in shape)
    assert len(s) == 2, f"expected 2-D shape, got {s}"
    return s


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "row", "col"],
    meta_fields=["shape", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class COO:
    """Padded COO matrix. Entries need not be sorted.

    data : (nnz_pad,) values; 0 in padding slots
    row  : (nnz_pad,) int32 row ids; ``shape[0]`` sentinel in padding slots
    col  : (nnz_pad,) int32 col ids; 0 in padding slots
    shape: static (m, n)
    nnz  : static number of *real* (non-padding) entries
    """

    data: jax.Array
    row: jax.Array
    col: jax.Array
    shape: Tuple[int, int]
    nnz: int

    @property
    def nnz_pad(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_scipy(A, nnz_pad: int | None = None, dtype=jnp.float32) -> "COO":
        A = A.tocoo()
        m, n = _as_shape(A.shape)
        nnz = int(A.nnz)
        if nnz_pad is None:
            nnz_pad = max(round_up(nnz, 128), 128)
        assert nnz_pad >= nnz, (nnz_pad, nnz)
        data = np.zeros(nnz_pad, dtype=np.dtype(dtype))
        row = np.full(nnz_pad, m, dtype=np.int32)
        col = np.zeros(nnz_pad, dtype=np.int32)
        data[:nnz] = A.data
        row[:nnz] = A.row
        col[:nnz] = A.col
        return COO(jnp.asarray(data), jnp.asarray(row), jnp.asarray(col), (m, n), nnz)

    # -- conversions --------------------------------------------------------

    def todense(self) -> jax.Array:
        m, n = self.shape
        out = jnp.zeros((m + 1, n), dtype=self.data.dtype)
        out = out.at[self.row, self.col].add(self.data, mode="drop")
        return out[:m]

    def to_scipy(self):
        import scipy.sparse as sp

        m, n = self.shape
        keep = np.asarray(self.row) < m  # nnz may be a capacity bound; trust the mask
        d = np.asarray(self.data)[keep]
        r = np.asarray(self.row)[keep]
        c = np.asarray(self.col)[keep]
        return sp.coo_matrix((d, (r, c)), shape=(m, n)).tocsr()

    def sort_rows(self) -> "CSR":
        """Coalescing-free stable sort into CSR form (device-side, jittable)."""
        m, n = self.shape
        # Stable lexicographic (row, col) sort via two stable argsorts.
        order_c = jnp.argsort(self.col, stable=True)
        row_c = self.row[order_c]
        order_r = jnp.argsort(row_c, stable=True)
        perm = order_c[order_r]
        row = self.row[perm]
        col = self.col[perm]
        data = self.data[perm]
        indptr = jnp.searchsorted(
            row, jnp.arange(m + 1, dtype=row.dtype), side="left"
        ).astype(jnp.int32)
        return CSR(data, row, col, indptr, self.shape, self.nnz)

    @property
    def mask(self) -> jax.Array:
        """(nnz_pad,) boolean: True for real entries."""
        return self.row < self.shape[0]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "row", "col", "indptr"],
    meta_fields=["shape", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class CSR:
    """Row-sorted padded COO + indptr (the canonical device container).

    Invariants: entries sorted by (row, col); padding (row==shape[0],
    col==0, data==0) lives at the tail; ``indptr`` has length m+1 with
    ``indptr[m] == nnz``.
    """

    data: jax.Array
    row: jax.Array
    col: jax.Array
    indptr: jax.Array
    shape: Tuple[int, int]
    nnz: int

    @property
    def nnz_pad(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def mask(self) -> jax.Array:
        return self.row < self.shape[0]

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_scipy(A, nnz_pad: int | None = None, dtype=jnp.float32) -> "CSR":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        A.sort_indices()
        m, n = _as_shape(A.shape)
        nnz = int(A.nnz)
        if nnz_pad is None:
            nnz_pad = max(round_up(nnz, 128), 128)
        assert nnz_pad >= nnz, (nnz_pad, nnz)
        data = np.zeros(nnz_pad, dtype=np.dtype(dtype))
        row = np.full(nnz_pad, m, dtype=np.int32)
        col = np.zeros(nnz_pad, dtype=np.int32)
        data[:nnz] = A.data
        col[:nnz] = A.indices
        row[:nnz] = np.repeat(np.arange(m, dtype=np.int32), np.diff(A.indptr))
        indptr = np.asarray(A.indptr, dtype=np.int32)
        return CSR(
            jnp.asarray(data),
            jnp.asarray(row),
            jnp.asarray(col),
            jnp.asarray(indptr),
            (m, n),
            nnz,
        )

    @staticmethod
    def from_dense(A: jax.Array, nnz_pad: int) -> "CSR":
        """Host-free construction from a dense array (jittable).

        Keeps the ``nnz_pad`` largest-|value| entries' *positions*; intended
        for tests and small operators.
        """
        m, n = A.shape
        flat = A.reshape(-1)
        present = flat != 0
        # Order: real entries first (stable keeps row-major order), pad after.
        perm = jnp.argsort(~present, stable=True)[:nnz_pad]
        keep = present[perm]
        row = jnp.where(keep, (perm // n).astype(jnp.int32), m)
        col = jnp.where(keep, (perm % n).astype(jnp.int32), 0)
        data = jnp.where(keep, flat[perm], 0)
        nnz_arr = jnp.sum(present)
        indptr = jnp.searchsorted(
            row, jnp.arange(m + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        # nnz is traced here; store the static bound.
        del nnz_arr
        return CSR(data, row, col, indptr, (int(m), int(n)), nnz_pad)

    def as_coo(self) -> COO:
        return COO(self.data, self.row, self.col, self.shape, self.nnz)

    # -- conversions --------------------------------------------------------

    def todense(self) -> jax.Array:
        return self.as_coo().todense()

    def to_scipy(self):
        return self.as_coo().to_scipy()

    def to_ell(self, width: int | None = None) -> "ELL":
        """Device-side CSR -> ELL repack (jittable when ``width`` is given)."""
        m, n = self.shape
        if width is None:
            width = int(np.max(np.diff(np.asarray(self.indptr))))
        # Position of each entry within its row.
        within = jnp.arange(self.nnz_pad, dtype=jnp.int32) - self.indptr[
            jnp.minimum(self.row, m)
        ]
        slot = jnp.where(self.mask, self.row * width + within, m * width)
        data = (
            jnp.zeros(m * width + 1, dtype=self.data.dtype)
            .at[slot]
            .add(self.data, mode="drop")[:-1]
            .reshape(m, width)
        )
        col = (
            jnp.zeros(m * width + 1, dtype=jnp.int32)
            .at[slot]
            .add(self.col, mode="drop")[:-1]
            .reshape(m, width)
        )
        return ELL(data, col, self.shape)

    # -- simple extractors (role of ns/lib/sparse.py:35-106) ----------------

    def diagonal(self) -> jax.Array:
        """Dense (m,) diagonal."""
        m, _ = self.shape
        on_diag = (self.row == self.col) & self.mask
        return jax.ops.segment_sum(
            jnp.where(on_diag, self.data, 0), self.row, num_segments=m
        )

    def _masked(self, keep: jax.Array) -> "CSR":
        """Zero out entries where ``keep`` is False (keeps sparsity pattern).

        Zeroed entries stay in the pattern with value 0 — harmless for all
        products, and keeps shapes static.
        """
        return CSR(
            jnp.where(keep, self.data, 0),
            self.row,
            self.col,
            self.indptr,
            self.shape,
            self.nnz,
        )

    def triu(self, k: int = 0) -> "CSR":
        return self._masked(self.col - self.row >= k)

    def tril(self, k: int = 0) -> "CSR":
        return self._masked(self.col - self.row <= k)

    def with_data(self, data: jax.Array) -> "CSR":
        assert data.shape == self.data.shape
        return CSR(data, self.row, self.col, self.indptr, self.shape, self.nnz)

    def abs(self) -> "CSR":
        return self.with_data(jnp.abs(self.data))

    def scale_rows(self, s: jax.Array) -> "CSR":
        """diag(s) @ A."""
        return self.with_data(self.data * s[jnp.minimum(self.row, self.shape[0] - 1)])

    def scale_cols(self, s: jax.Array) -> "CSR":
        """A @ diag(s)."""
        return self.with_data(self.data * s[self.col])

    def row_degrees(self) -> jax.Array:
        """(m,) number of stored entries per row."""
        return self.indptr[1:] - self.indptr[:-1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "col"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class ELL:
    """Fixed-width (ELLPACK) rows: the SpMV hot-path layout.

    data : (m, width) values, 0 in padding slots
    col  : (m, width) int32 columns, 0 in padding slots
    """

    data: jax.Array
    col: jax.Array
    shape: Tuple[int, int]

    @property
    def width(self) -> int:
        return int(self.data.shape[1])

    @property
    def dtype(self):
        return self.data.dtype

    @staticmethod
    def from_scipy(A, width: int | None = None, dtype=jnp.float32) -> "ELL":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        A.sort_indices()
        m, n = _as_shape(A.shape)
        deg = np.diff(A.indptr)
        w = int(deg.max()) if width is None else int(width)
        assert w >= deg.max(), (w, deg.max())
        if np.dtype(dtype) == np.float32:
            # C++ packing fast path (mlamg_tpu/native)
            from mlamg_tpu import native

            if native.available():
                data, col = native.csr_to_ell(A, w)
                return ELL(jnp.asarray(data), jnp.asarray(col), (m, n))
        data = np.zeros((m, w), dtype=np.dtype(dtype))
        col = np.zeros((m, w), dtype=np.int32)
        # vectorized fill
        rows = np.repeat(np.arange(m), deg)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], deg)
        data[rows, offs] = A.data
        col[rows, offs] = A.indices
        return ELL(jnp.asarray(data), jnp.asarray(col), (m, n))

    def todense(self) -> jax.Array:
        m, n = self.shape
        out = jnp.zeros((m, n), dtype=self.data.dtype)
        r = jnp.broadcast_to(jnp.arange(m)[:, None], self.data.shape)
        return out.at[r, self.col].add(self.data)

    def to_scipy(self):
        import scipy.sparse as sp

        m, n = self.shape
        d = np.asarray(self.data).ravel()
        r = np.repeat(np.arange(m), self.width)
        c = np.asarray(self.col).ravel()
        keep = d != 0
        return sp.coo_matrix((d[keep], (r[keep], c[keep])), shape=(m, n)).tocsr()
