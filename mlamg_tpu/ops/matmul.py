"""Sparse matrix products, TPU-first.

- SpMV / SpMM run as masked gather + segment-sum (XLA lowers these to fast
  one-pass scatter-adds on TPU); the ELL layout additionally offers a purely
  dense-shaped gather + row-reduction that the Mosaic/XLA pipeline vectorizes
  onto the VPU with zero dynamism.  A hand-written Pallas SpMV lives in
  :mod:`mlamg_tpu.ops.pallas_kernels`.
- SpGEMM uses the expand / sort / coalesce scheme with *static* nnz upper
  bounds (row-degree products), the TPU answer to dynamic-size symbolic
  phases of CPU/GPU SpGEMMs.
- The Galerkin triple product RAP is provided in two forms: a dense-coarse
  form ``rap_dense`` (two MXU matmuls through a dense (n,k) P — optimal
  whenever the coarse side fits, which is the reference's entire two-level
  regime) and a fully sparse ``rap`` built on spgemm.

Capability parity: replaces torch_sparse ``spspmm``/``spmm``/``transpose``
(reference ns/lib/sparse_tensor.py:9-59) and the scipy products inside
``amg_2_v`` (reference ns/lib/multigrid.py:165).

All functions are jit-safe and differentiable w.r.t. values.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import COO, CSR, ELL


def _is_dia(A):
    from mlamg_tpu.ops.dia import DIA

    return isinstance(A, DIA)


# ---------------------------------------------------------------------------
# SpMV / SpMM
# ---------------------------------------------------------------------------


def _is_well(A):
    from mlamg_tpu.ops.unstructured import WindowedELL

    return isinstance(A, WindowedELL)


def spmv(A, x: jax.Array) -> jax.Array:
    """y = A @ x for CSR/COO/ELL/DIA/BSR/WindowedELL (or dense) A, dense (n,) x."""
    if isinstance(A, jax.Array):
        return A @ x
    if type(A).__name__ == "BSR":
        from mlamg_tpu.ops.bsr import bsr_spmv

        return bsr_spmv(A, x)
    if _is_well(A):
        from mlamg_tpu.ops.unstructured import well_spmv_pallas

        return well_spmv_pallas(A, x, interpret=jax.default_backend() != "tpu")
    if _is_dia(A):
        from mlamg_tpu.ops.dia import dia_spmv

        if A.data.ndim == 3 and jax.default_backend() == "tpu":
            # pre-blocked layout (pallas_kernels.blocked_dia): production
            # TPU path — pure streaming, no per-call relayout
            from mlamg_tpu.ops.pallas_kernels import dia_spmv_pallas

            return dia_spmv_pallas(A, x)
        return dia_spmv(A, x)
    if isinstance(A, ELL):
        return jnp.sum(A.data * x[A.col], axis=1)
    m, _ = A.shape
    return jax.ops.segment_sum(A.data * x[A.col], A.row, num_segments=m)


def spmv_affine(A, x: jax.Array, c: jax.Array | None = None, alpha: float = 1.0):
    """y = alpha * (A @ x) + c, fused into one pass where possible.

    On TPU with a pre-blocked DIA operand this is a single streaming Pallas
    kernel — the fine-level cost of a Jacobi sweep (x' = M x + c) or a
    residual (r = b - A x via alpha=-1, c=b) collapses to one SpMV.
    Everywhere else XLA fuses the scale/add into the SpMV epilogue.
    """
    if _is_well(A):
        from mlamg_tpu.ops.unstructured import well_spmv_pallas

        return well_spmv_pallas(
            A, x, c=c, alpha=alpha, interpret=jax.default_backend() != "tpu"
        )
    if _is_dia(A) and A.data.ndim == 3 and jax.default_backend() == "tpu":
        from mlamg_tpu.ops.pallas_kernels import dia_spmv_pallas

        return dia_spmv_pallas(A, x, c=c, alpha=alpha)
    y = spmv(A, x)
    if alpha != 1.0:
        y = alpha * y
    return y if c is None else y + c


def spmv_t(A, x: jax.Array) -> jax.Array:
    """y = A.T @ x without materializing the transpose."""
    if isinstance(A, jax.Array):
        return A.T @ x
    if _is_dia(A):
        from mlamg_tpu.ops.dia import dia_spmv_t

        return dia_spmv_t(A, x)
    _, n = A.shape
    if isinstance(A, ELL):
        m = A.shape[0]
        contrib = A.data * x[:, None]
        return jax.ops.segment_sum(
            contrib.reshape(-1), A.col.reshape(-1), num_segments=n
        )
    return jax.ops.segment_sum(A.data * x[A.row], A.col, num_segments=n)


def spmm(A, X: jax.Array) -> jax.Array:
    """Y = A @ X for sparse (or dense) A (m,n) and dense X (n,k)."""
    if isinstance(A, jax.Array):
        return A @ X
    if _is_dia(A):
        from mlamg_tpu.ops.dia import dia_spmm

        return dia_spmm(A, X)
    if isinstance(A, ELL):
        # (m, w, k) gather then row-reduce; dense shapes throughout.
        return jnp.einsum("mw,mwk->mk", A.data, X[A.col])
    m, _ = A.shape
    return jax.ops.segment_sum(A.data[:, None] * X[A.col], A.row, num_segments=m)


def spmm_t(A, X: jax.Array) -> jax.Array:
    """Y = A.T @ X for sparse A (m,n) and dense X (m,k)."""
    if isinstance(A, jax.Array):
        return A.T @ X
    _, n = A.shape
    if isinstance(A, ELL):
        m, w = A.data.shape
        contrib = (A.data[:, :, None] * X[:, None, :]).reshape(m * w, -1)
        return jax.ops.segment_sum(contrib, A.col.reshape(-1), num_segments=n)
    return jax.ops.segment_sum(A.data[:, None] * X[A.row], A.col, num_segments=n)


# ---------------------------------------------------------------------------
# Transpose
# ---------------------------------------------------------------------------


def transpose(A: CSR | COO) -> CSR:
    """A.T as a CSR, via stable (col,row) sort. Jittable; static shapes."""
    m, n = A.shape
    # Padding rows carry sentinel m; map their col to sentinel n so they sort
    # to the tail of the transposed matrix as well.
    mask = A.row < m
    t_row = jnp.where(mask, A.col, n)
    t_col = jnp.where(mask, A.row, 0)
    flipped = COO(A.data, t_row, t_col, (n, m), A.nnz)
    return flipped.sort_rows()


# ---------------------------------------------------------------------------
# Coalesce (sum duplicate coordinates)  — shared by SpGEMM
# ---------------------------------------------------------------------------


def coalesce(
    data: jax.Array,
    row: jax.Array,
    col: jax.Array,
    shape,
    nnz_out: int,
    return_overflow: bool = False,
) -> CSR:
    """Sort COO triplets by (row, col), merge duplicates, pad to ``nnz_out``.

    Padding-in: entries with ``row >= shape[0]``.  Static output size; if the
    true coalesced nnz exceeds ``nnz_out`` the largest coordinates are
    dropped.  With ``return_overflow`` the (CSR, overflowed) pair is
    returned, where ``overflowed`` is a traced bool — host-driven setup code
    (e.g. build_hierarchy) must check it and re-run with a larger bound;
    truncation is never silent on those paths.
    """
    m, n = shape
    mask = row < m
    # One fused lexicographic (row, col) sort carrying the values along —
    # a single XLA sort instead of two argsort+gather chains (the dominant
    # cost of SpGEMM on TPU).  Stability is irrelevant: duplicates are
    # merged by a commutative segment-sum.  When the coordinate space fits
    # int32, pack (row, col) into one key — a single-key sort is cheaper
    # on TPU than a lexicographic two-key sort.
    if m * (n + 1) + n < 2**31:
        key = jnp.where(mask, row * (n + 1) + col, m * (n + 1)).astype(jnp.int32)
        key, d = jax.lax.sort(
            (key, jnp.where(mask, data, 0)), num_keys=1, is_stable=False
        )
        r = key // (n + 1)
        c = key - r * (n + 1)
    else:
        r, c, d = jax.lax.sort(
            (
                jnp.where(mask, row, m).astype(jnp.int32),
                jnp.where(mask, col, n).astype(jnp.int32),
                jnp.where(mask, data, 0),
            ),
            num_keys=2,
            is_stable=False,
        )
    rm = r < m

    # Segment ids: a new segment starts wherever (row, col) changes.
    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), dtype=jnp.int32),
            ((r[1:] != r[:-1]) | (c[1:] != c[:-1])).astype(jnp.int32),
        ]
    )
    new_seg = jnp.where(rm, new_seg, 0)  # padding contributes no segments
    seg = jnp.cumsum(new_seg) - 1  # real entries: 0..K-1; leading pads: -1
    seg = jnp.where(rm, seg, nnz_out)  # out-of-range => dropped by segment ops

    out_data = jax.ops.segment_sum(d, seg, num_segments=nnz_out)
    # First element of each segment holds the coordinates.
    first = (new_seg == 1) & rm
    out_row = jax.ops.segment_sum(
        jnp.where(first, r, 0), jnp.where(first, seg, nnz_out), num_segments=nnz_out
    )
    out_col = jax.ops.segment_sum(
        jnp.where(first, c, 0), jnp.where(first, seg, nnz_out), num_segments=nnz_out
    )
    # Mark unused output slots as padding.
    k = jnp.max(jnp.where(rm, seg + 1, 0))
    slot = jnp.arange(nnz_out, dtype=jnp.int32)
    used = slot < k
    out_row = jnp.where(used, out_row, m).astype(jnp.int32)
    out_col = jnp.where(used, out_col, 0).astype(jnp.int32)
    out_data = jnp.where(used, out_data, 0)
    indptr = jnp.searchsorted(
        out_row, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    out = CSR(out_data, out_row, out_col, indptr, (m, n), nnz_out)
    if return_overflow:
        return out, k > nnz_out
    return out


# ---------------------------------------------------------------------------
# SpGEMM
# ---------------------------------------------------------------------------


def spgemm(
    A: CSR, B: CSR, *, nnz_out: int, b_width: int | None = None,
    return_overflow: bool = False,
) -> CSR:
    """C = A @ B with a static output capacity ``nnz_out``.

    Expand-sort-coalesce: every A entry (i,k,va) is multiplied against the
    (padded, fixed-width) k-th row of B, giving ``nnz_pad(A) * width(B)``
    candidate triplets that are then coalesced.  Fully static, jittable,
    differentiable.

    ``b_width`` caps B's ELL width (defaults to B's max row degree, computed
    on host from indptr if available — pass it explicitly under jit).
    ``return_overflow`` additionally returns a traced bool that is True iff
    the true product nnz exceeded ``nnz_out`` (result truncated).
    """
    m, p = A.shape
    p2, n = B.shape
    assert p == p2, (A.shape, B.shape)
    B_ell = B.to_ell(b_width) if not isinstance(B, ELL) else B
    w = B_ell.width

    # For each A entry, gather the corresponding B row (pad A entries gather
    # row 0 but are masked via the sentinel row id).
    bk = jnp.minimum(A.col, p - 1)
    b_cols = B_ell.col[bk]  # (nnzA, w)
    b_vals = B_ell.data[bk]  # (nnzA, w)
    vals = (A.data[:, None] * b_vals).reshape(-1)
    rows = jnp.broadcast_to(A.row[:, None], b_cols.shape).reshape(-1)
    cols = b_cols.reshape(-1)
    # Zero-valued expanded slots (B padding) must not create pattern entries:
    # push them to the sentinel row.
    live = (b_vals != 0).reshape(-1)
    rows = jnp.where(live, rows, m)
    return coalesce(vals, rows, cols, (m, n), nnz_out,
                    return_overflow=return_overflow)


def spgemm_masked(
    A: CSR, B: CSR, pattern: CSR, *, a_width: int, b_width: int,
    chunk: int | None = None,
) -> CSR:
    """(A @ B) restricted to the sparsity pattern of ``pattern``.

    For every pattern entry (i, j): sum_k A[i,k] * B[k,j], computed by
    comparing A's fixed-width row i against B's fixed-width rows — an
    O(nnz * a_width * b_width) dense-shaped contraction with no sorting.
    This is the static-shape workhorse behind pattern-preserving matrix
    powers (evolution strength of connection, filtered smoothers) and the
    pattern-masked Galerkin RAP of the large-scale unstructured multilevel
    setup (mg/amg_unstructured.py), where the coarse pattern is known
    host-side ahead of the numeric product.

    ``chunk`` bounds the (chunk, a_width, b_width) expansion buffer by
    processing pattern entries in fixed-size slices under ``lax.map`` —
    required at scale (e.g. 4M pattern entries x 80 x 16 would otherwise
    materialize >20 GB).
    """
    m, p = A.shape
    A_ell = A.to_ell(a_width) if not isinstance(A, ELL) else A
    B_ell = B.to_ell(b_width) if not isinstance(B, ELL) else B

    def compute(i, j):
        i = jnp.minimum(i, m - 1)  # (E,)
        a_cols = A_ell.col[i]  # (E, wa) — the k's
        a_vals = A_ell.data[i]  # (E, wa)
        b_cols = B_ell.col[a_cols]  # (E, wa, wb)
        b_vals = B_ell.data[a_cols]  # (E, wa, wb)
        match = b_cols == j[:, None, None]
        contrib = a_vals[:, :, None] * jnp.where(match, b_vals, 0.0)
        return jnp.sum(contrib, axis=(1, 2))

    E = pattern.row.shape[0]
    if chunk is None or chunk >= E:
        vals = compute(pattern.row, pattern.col)
    else:
        nc = -(-E // chunk)
        # pad with sentinel rows (masked out below); reshape to (nc, chunk)
        ip = jnp.full((nc * chunk,), m, pattern.row.dtype).at[:E].set(pattern.row)
        jp = jnp.zeros((nc * chunk,), pattern.col.dtype).at[:E].set(pattern.col)
        vals = jax.lax.map(
            lambda args: compute(*args),
            (ip.reshape(nc, chunk), jp.reshape(nc, chunk)),
        ).reshape(-1)[:E]
    vals = jnp.where(pattern.mask, vals, 0.0)
    return pattern.with_data(vals)


# ---------------------------------------------------------------------------
# Galerkin products
# ---------------------------------------------------------------------------


def rap_dense(A, P) -> jax.Array:
    """Dense coarse Galerkin operator A_H = P.T @ A @ P, shape (k, k).

    ``P`` may be a dense (n, k) array or any sparse container.  The (n, k)
    intermediate AP is dense, so both contractions hit the MXU.  This is the
    TPU-native realization of the reference's scipy ``P.T@A@P``
    (ns/lib/multigrid.py:165) for the two-level regime where k = alpha*n is
    small enough to keep dense.
    """
    if isinstance(P, (CSR, COO, ELL)):
        P = densify(P)
    AP = spmm(A, P)  # dispatches over CSR/COO/ELL/DIA/dense
    return P.T @ AP


def rap(A: CSR, P: CSR, *, nnz_ap: int, nnz_out: int, a_width: int, p_width: int,
        return_overflow: bool = False):
    """Sparse Galerkin triple product via two SpGEMMs (multilevel path).

    With ``return_overflow``, returns (A_H, overflowed) where ``overflowed``
    is True iff either SpGEMM exceeded its static bound (truncated result).
    """
    if return_overflow:
        AP, ov1 = spgemm(A, P, nnz_out=nnz_ap, b_width=p_width, return_overflow=True)
        Pt = transpose(P)
        out, ov2 = spgemm(Pt, AP, nnz_out=nnz_out,
                          b_width=min(nnz_ap, a_width * p_width),
                          return_overflow=True)
        return out, ov1 | ov2
    AP = spgemm(A, P, nnz_out=nnz_ap, b_width=p_width)
    Pt = transpose(P)
    return spgemm(Pt, AP, nnz_out=nnz_out, b_width=min(nnz_ap, a_width * p_width))


def rap_fused(A: CSR, P, *, k: int, nnz_out: int, p_width: int,
              return_overflow: bool = False):
    """Sparse Galerkin product A_H = P.T @ A @ P as ONE expand + coalesce.

    Expands every A entry (i, j, a) against the (fixed-width) P rows i and j:

        A_H[r, s] += P[i, r] * a * P[j, s]

    i.e. nnz(A) * p_width**2 candidate triplets and a single sort/merge —
    versus the two chained SpGEMMs of :func:`rap` (transpose sort + two
    coalesce sorts over a much wider expansion).  This is the TPU-shaped
    realization of the reference's scipy ``P.T @ A @ P``
    (ns/lib/multigrid.py:165) for multilevel setup where the coarse side is
    kept sparse.

    ``k`` is the coarse dimension (columns of P); ``p_width`` caps P's row
    degree.  With ``return_overflow`` also returns a traced bool that is
    True iff the true product nnz exceeded ``nnz_out``.
    """
    m, _ = A.shape
    P_ell = P.to_ell(p_width) if not isinstance(P, ELL) else P
    wp = P_ell.width

    i = jnp.minimum(A.row, m - 1)
    j = jnp.minimum(A.col, m - 1)
    pi_cols = P_ell.col[i]  # (nnzA, wp)
    pi_vals = P_ell.data[i]
    pj_cols = P_ell.col[j]
    pj_vals = P_ell.data[j]

    vals = (A.data[:, None, None] * pi_vals[:, :, None]) * pj_vals[:, None, :]
    rows = jnp.broadcast_to(pi_cols[:, :, None], (A.data.shape[0], wp, wp))
    cols = jnp.broadcast_to(pj_cols[:, None, :], (A.data.shape[0], wp, wp))
    # Dead slots (A padding, P pad lanes) must not create pattern entries.
    live = (
        A.mask[:, None, None]
        & (pi_vals != 0)[:, :, None]
        & (pj_vals != 0)[:, None, :]
    )
    rows = jnp.where(live, rows, k)
    return coalesce(
        vals.reshape(-1), rows.reshape(-1), cols.reshape(-1), (k, k), nnz_out,
        return_overflow=return_overflow,
    )


def densify(P) -> jax.Array:
    """Dense view of any container (small operators only)."""
    return P.todense()
