"""Factored smoothed-aggregation prolongator: apply P = S·T without ever
materializing it.

The SA prolongator (reference ns/lib/multigrid.py:102-108) is

    P = (I - omega D^-1 A) Agg = S · T

with S sharing A's sparsity and T the (n, k) one-hot aggregation operator.
Materializing P densely makes restriction/prolongation the V-cycle's
dominant HBM traffic (an (n, k) stream each way — measured 2 GB/iteration
at n = 262k, k = 1024, ~85% of the whole two-level iteration).  Applying
the factors instead costs

    interp    P e   = S (T e)      — one broadcast + one stencil SpMV
    restrict  P^T r = T^T (S^T r)  — one stencil SpMV + one segment-reduce

i.e. two more O(nnz) streaming passes and zero O(n*k) traffic.  For DIA
(stencil) operators both SpMVs ride the Pallas fast path; S^T is
precomputed as its own DIA so the transpose apply is also a forward
streaming kernel.

Two aggregation operators are provided:

- :class:`BoxAgg2D` — structured box aggregates on a regular (ny, nx)
  grid: T e is a reshape+broadcast and T^T v a reshape+sum, both pure XLA
  streaming (no gather/scatter at all).
- :class:`AggOp` — arbitrary assignment vector (Lloyd output): T e is a
  gather, T^T v a segment-sum.

``coarse_operator_factored`` forms the dense Galerkin operator
P^T A P in column blocks (setup-time only, jittable, never materializes
the (n, k) dense P).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR, ELL
from mlamg_tpu.ops.dia import DIA, dia_jacobi_operator, dia_spmm
from mlamg_tpu.ops import matmul


def dia_transpose(A: DIA) -> DIA:
    """A.T as its own DIA (negated offsets, shifted diagonals).

    data'[d', j] = A.T[j, j + o'] = A[j + o', j] = data[d(-o'), j + o'].
    Preserves a blocked (D, n/128, 128) layout.
    """
    data = A.data2d
    n = A.shape[0]
    rows = []
    for d, o in enumerate(A.offsets):
        op = -o
        row = data[d]
        if op >= 0:
            row = jnp.concatenate([row[op:], jnp.zeros((op,), row.dtype)])
        else:
            row = jnp.concatenate([jnp.zeros((-op,), row.dtype), row[:op]])
        rows.append(row)
    out = DIA(jnp.stack(rows), tuple(-o for o in A.offsets), (A.shape[1], A.shape[0]))
    if A.data.ndim == 3:
        out = DIA(
            out.data.reshape(A.data.shape), out.offsets, out.shape
        )
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["ny", "nx", "sy", "sx"],
)
@dataclasses.dataclass(frozen=True)
class BoxAgg2D:
    """Structured (sy, sx) box aggregation of a row-major (ny, nx) grid.

    Node (iy, ix) -> aggregate (iy // sy) * (nx // sx) + (ix // sx);
    the same numbering as a row-major coarse grid.  Applications are
    separable rank-1 contractions T = B_y (x) B_x with 0/1 block-sum
    matrices, executed as two small dense matmuls on the 2-D view — MXU
    work with lane-friendly layouts (a reshape-and-reduce over the
    (..., s) minor axis pads 16 values into 128 lanes and measures ~10x
    slower on v5e)."""

    ny: int
    nx: int
    sy: int
    sx: int

    def _B(self, m: int, s: int, dtype) -> jax.Array:
        """(m, m//s) block-sum matrix: B[i, j] = 1 iff i // s == j."""
        return (jnp.arange(m)[:, None] // s == jnp.arange(m // s)[None, :]).astype(
            dtype
        )

    @property
    def n(self) -> int:
        return self.ny * self.nx

    @property
    def k(self) -> int:
        return (self.ny // self.sy) * (self.nx // self.sx)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.k)

    @property
    def agg_id(self) -> jax.Array:
        iy = jnp.arange(self.n) // self.nx
        ix = jnp.arange(self.n) % self.nx
        return (iy // self.sy) * (self.nx // self.sx) + ix // self.sx

    def interp(self, e: jax.Array) -> jax.Array:
        """T e: broadcast each coarse value over its box (B_y E B_x^T)."""
        ncy, ncx = self.ny // self.sy, self.nx // self.sx
        By = self._B(self.ny, self.sy, e.dtype)
        Bx = self._B(self.nx, self.sx, e.dtype)
        if e.ndim == 1:
            E = e.reshape(ncy, ncx)
            return (By @ E @ Bx.T).reshape(self.n)
        c = e.shape[1]
        E = e.reshape(ncy, ncx, c)
        out = jnp.einsum("yY,YXc,xX->yxc", By, E, Bx)
        return out.reshape(self.n, c)

    def restrict(self, v: jax.Array) -> jax.Array:
        """T^T v: sum each box (B_y^T V B_x)."""
        ncy, ncx = self.ny // self.sy, self.nx // self.sx
        By = self._B(self.ny, self.sy, v.dtype)
        Bx = self._B(self.nx, self.sx, v.dtype)
        if v.ndim == 1:
            V = v.reshape(self.ny, self.nx)
            return (By.T @ V @ Bx).reshape(self.k)
        c = v.shape[1]
        V = v.reshape(self.ny, self.nx, c)
        out = jnp.einsum("Yy,YXc,Xx->yxc", By, V, Bx)
        return out.reshape(self.k, c)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["agg_id"],
    meta_fields=["n", "k"],
)
@dataclasses.dataclass(frozen=True)
class AggOp:
    """General aggregation operator from an assignment vector.

    ``agg_id[i] >= k`` marks an unassigned node (zero row of T)."""

    agg_id: jax.Array  # (n,) int32
    n: int
    k: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.k)

    def interp(self, e: jax.Array) -> jax.Array:
        idx = jnp.clip(self.agg_id, 0, self.k - 1)
        out = e[idx]
        assigned = self.agg_id < self.k
        if e.ndim > 1:
            assigned = assigned[:, None]
        return jnp.where(assigned, out, 0)

    def restrict(self, v: jax.Array) -> jax.Array:
        assigned = self.agg_id < self.k
        if v.ndim > 1:
            data = jnp.where(assigned[:, None], v, 0)
        else:
            data = jnp.where(assigned, v, 0)
        return jax.ops.segment_sum(
            data, jnp.clip(self.agg_id, 0, self.k - 1), num_segments=self.k
        )


Agg = Union[BoxAgg2D, AggOp]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["ny", "nx"],
)
@dataclasses.dataclass(frozen=True)
class BilinearP2D:
    """Vertex-centered bilinear prolongator with side-2 coarsening.

    Coarse node (jy, jx) sits on fine node (2*jy + 1, 2*jx + 1); the 1-D
    stencil is [1/2, 1, 1/2] (odd fine nodes are injected, even fine nodes
    average their two coarse neighbours, with the Dirichlet wall as zero).
    This is classical geometric multigrid interpolation (the role the
    reference delegates to pyamg's hierarchy on structured families,
    ns/lib/multigrid.py:102-210): under Galerkin RAP a compact 9-point
    stencil reproduces a compact 9-point stencil at *every* level — the
    per-axis coarse reach is floor((r + 2) / 2), with fixed point r = 1 —
    so the all-DIA hierarchy never widens and conv stays at geometric-MG
    levels (~0.1) instead of the ~0.75 of aggressive box aggregation.

    Both applications are separable strided slice/pad/add passes — zero
    gathers, zero FLOP-heavy matmuls, pure streaming on the 2-D view.
    """

    ny: int
    nx: int

    def __post_init__(self):
        if self.ny % 2 or self.nx % 2:
            raise ValueError("BilinearP2D requires even grid sides")

    @property
    def ncy(self) -> int:
        return self.ny // 2

    @property
    def ncx(self) -> int:
        return self.nx // 2

    @property
    def n(self) -> int:
        return self.ny * self.nx

    @property
    def k(self) -> int:
        return self.ncy * self.ncx

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.k)

    @property
    def dtype(self):
        return jnp.float32

    @staticmethod
    def _interp_axis(E: jax.Array, axis: int) -> jax.Array:
        """1-D interp along ``axis``: out[2j+1] = E[j], out[2j] = (E[j-1]+E[j])/2.

        Implemented with axis-native slices and an interleaving
        stack+reshape — no transposes (a moveaxis at the 4096^2 fine level
        costs several full-array HBM copies per application)."""
        m = E.shape[axis]
        sl = [slice(None)] * E.ndim
        sl[axis] = slice(None, -1)
        pad = [(0, 0)] * E.ndim
        pad[axis] = (1, 0)
        left = jnp.pad(E[tuple(sl)], pad)
        even = 0.5 * (left + E)
        out = jnp.stack([even, E], axis=axis + 1)
        return out.reshape(*E.shape[:axis], 2 * m, *E.shape[axis + 1 :])

    @staticmethod
    def _restrict_axis(V: jax.Array, axis: int) -> jax.Array:
        """Transpose of :meth:`_interp_axis`: r[j] = V[2j+1] + (V[2j]+V[2j+2])/2."""
        sl_even = [slice(None)] * V.ndim
        sl_even[axis] = slice(0, None, 2)
        sl_odd = [slice(None)] * V.ndim
        sl_odd[axis] = slice(1, None, 2)
        even = V[tuple(sl_even)]
        odd = V[tuple(sl_odd)]
        sl_next = [slice(None)] * V.ndim
        sl_next[axis] = slice(1, None)
        pad = [(0, 0)] * V.ndim
        pad[axis] = (0, 1)
        even_next = jnp.pad(even[tuple(sl_next)], pad)
        return odd + 0.5 * (even + even_next)

    def interp(self, e: jax.Array) -> jax.Array:
        """P e: (k,) or (k, c) coarse vector to (n,) / (n, c) fine.

        The optimization barriers pin a materialized 2-D canonical-layout
        array at each flat<->grid boundary: the relayout copy is cheap
        (HBM-bandwidth), while letting XLA fuse the interleave ops into
        the flat (1-D-tiled) consumers generates catastrophic strided
        code (measured 12.2 ms vs 1.2 ms for a fine-level restrict+interp
        round trip at 4096^2 on v5e)."""
        c_shape = e.shape[1:]
        E = jax.lax.optimization_barrier(
            e.reshape(self.ncy, self.ncx, *c_shape)
        )
        E = self._interp_axis(E, 0)
        E = self._interp_axis(E, 1)
        return jax.lax.optimization_barrier(E).reshape(self.n, *c_shape)

    def restrict(self, v: jax.Array) -> jax.Array:
        """P^T v: (n,) or (n, c) fine vector to (k,) / (k, c) coarse."""
        c_shape = v.shape[1:]
        V = jax.lax.optimization_barrier(
            v.reshape(self.ny, self.nx, *c_shape)
        )
        V = self._restrict_axis(V, 0)
        V = self._restrict_axis(V, 1)
        return jax.lax.optimization_barrier(V).reshape(self.k, *c_shape)

    # dense-block applications share the vector code path (trailing batch dim)
    interp_mm = interp
    restrict_mm = restrict

    def densify(self) -> jax.Array:
        """Dense (n, k) P — tests/small problems only."""
        return self.interp(jnp.eye(self.k, dtype=jnp.float32))

    def coarse_reach(self, ry: int, rx: int) -> Tuple[int, int]:
        """Per-axis reach of P^T A P for a fine reach-(ry, rx) stencil."""
        return (ry + 2) // 2, (rx + 2) // 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Ss", "Sts", "T"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class FactoredSA:
    """P = S_s ··· S_1 · T applied by its factors (never materialized).

    Each ``Ss[i]`` is a Jacobi-type smoothing factor (I - w_i D^-1 A) in
    A's format, ``Sts[i]`` its precomputed transpose (so restriction is
    also a *forward* SpMV on the fast path), ``T`` the aggregation
    operator.  One factor is the classic SA prolongator; several factors
    give the Chebyshev-smoothed prolongator (product = the minimax
    polynomial over the smoothed band), trading s extra SpMVs per
    interp/restrict for substantially stronger coarse-grid correction —
    the factors commute (all polynomials in D^-1 A), so application order
    is free."""

    Ss: Tuple  # DIA / CSR / ELL factors
    Sts: Tuple
    T: Agg

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.T.shape[0], self.T.shape[1])

    @property
    def dtype(self):
        return self.Ss[0].data.dtype

    @property
    def smooth_steps(self) -> int:
        return len(self.Ss)

    def interp(self, e: jax.Array) -> jax.Array:
        u = self.T.interp(e)
        for S in self.Ss:
            u = matmul.spmv(S, u)
        return u

    def restrict(self, r: jax.Array) -> jax.Array:
        for St in self.Sts:
            r = matmul.spmv(St, r)
        return self.T.restrict(r)

    def interp_mm(self, E: jax.Array) -> jax.Array:
        """(n, c) = P @ E for a dense (k, c) block (setup-time)."""
        U = self.T.interp(E)
        for S in self.Ss:
            U = matmul.spmm(S, U)
        return U

    def restrict_mm(self, V: jax.Array) -> jax.Array:
        """(k, c) = P.T @ V for a dense (n, c) block (setup-time)."""
        for St in self.Sts:
            V = matmul.spmm(St, V)
        return self.T.restrict(V)

    def densify(self) -> jax.Array:
        """Dense (n, k) P — tests/small problems only."""
        return self.interp_mm(jnp.eye(self.shape[1], dtype=self.dtype))


def _csr_jacobi_smoother(A: CSR, Dinv: jax.Array, omega) -> CSR:
    """(I - omega D^-1 A) with A's pattern, as CSR."""
    n = A.shape[0]
    live = A.mask
    rsafe = jnp.minimum(A.row, n - 1)
    data = -omega * Dinv[rsafe] * A.data
    data = jnp.where(live & (A.row == A.col), data + 1.0, data)
    data = jnp.where(live, data, 0.0)
    return CSR(data, A.row, A.col, A.indptr, A.shape, A.nnz)


def factored_sa(A, T: Agg, omega=None, power_iters: int = 30,
                smooth_steps: int = 1, lmax=None) -> FactoredSA:
    """Build the factored SA prolongator for A and an aggregation operator.

    With ``smooth_steps == 1`` (default) this is numerically identical to
    ``sa_interpolation_dense(A, T.agg_id, T.k)`` (same omega default:
    (4/3)/rho(D^-1 A) by power iteration).  With s > 1 the weights are the
    inverse Chebyshev roots over [lmax/15, lmax] (the same band the cycle
    smoother targets), so prod_i (1 - w_i t) is the minimax degree-s
    polynomial with p(0) = 1 — the Chebyshev-smoothed prolongator.
    ``omega`` may also be an explicit sequence of weights."""
    import numpy as _np

    from mlamg_tpu.mg.interp import sa_omega

    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    if omega is None:
        if smooth_steps == 1:
            omegas = [sa_omega(A, Dinv, iters=power_iters)]
        else:
            if lmax is None:
                lmax = (4.0 / 3.0) / sa_omega(A, Dinv, iters=power_iters)
            a_b, b_b = lmax / 15.0, lmax
            ang = (
                (2.0 * _np.arange(1, smooth_steps + 1) - 1)
                / (2.0 * smooth_steps) * _np.pi
            )
            roots = (a_b + b_b) / 2.0 + (b_b - a_b) / 2.0 * jnp.asarray(
                _np.cos(ang), jnp.float32
            )
            omegas = list(1.0 / roots)
    elif _np.ndim(omega) == 0:
        omegas = [omega] * smooth_steps if smooth_steps > 1 else [omega]
    else:
        omegas = list(omega)

    Ss, Sts = [], []
    for w in omegas:
        if isinstance(A, DIA):
            S = dia_jacobi_operator(A, Dinv, w)
            if S is None:  # no stored main diagonal: fall back to CSR
                S = _csr_jacobi_smoother(
                    CSR.from_scipy(A.to_scipy()), Dinv, w
                )
                St = matmul.transpose(S)
            else:
                St = dia_transpose(S)
        else:
            S = _csr_jacobi_smoother(A, Dinv, w)
            St = matmul.transpose(S)
        Ss.append(S)
        Sts.append(St)
    return FactoredSA(tuple(Ss), tuple(Sts), T)


def coarse_operator_factored(A, P: FactoredSA, block: int = 128) -> jax.Array:
    """Dense Galerkin operator P^T A P, formed in column blocks.

    Never materializes the (n, k) dense P; peak extra memory is one
    (n, block) slab.  Setup-time only (jittable)."""
    k = P.shape[1]
    eye = jnp.eye(k, dtype=P.dtype)
    cols = []
    for j0 in range(0, k, block):
        E = eye[:, j0 : min(j0 + block, k)]
        X = P.interp_mm(E)  # (n, c)
        Y = matmul.spmm(A, X)
        cols.append(P.restrict_mm(Y))  # (k, c)
    return jnp.concatenate(cols, axis=1)
