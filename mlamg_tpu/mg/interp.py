"""Aggregation-based interpolation operators.

Role of the reference's ``smoothed_aggregation_jacobi``
(ns/lib/multigrid.py:102-108): tentative prolongator from an aggregate
assignment, smoothed by one weighted-Jacobi step

    P = (I - omega D^-1 A) Agg,   omega = (4/3) / rho(D^-1 A)

with rho obtained by power iteration instead of ARPACK ``eigs``.  Both a
dense-P form (MXU path, the two-level training regime) and a sparse ELL
form with aggregate-mapped columns are provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR, ELL
from mlamg_tpu.ops.matmul import spmm
from mlamg_tpu.graph.strength import power_iteration_lmax


def tentative_dense(agg_id: jax.Array, k: int, dtype=jnp.float32) -> jax.Array:
    """(n, k) one-hot tentative prolongator (unassigned rows are zero)."""
    return jax.nn.one_hot(agg_id, k, dtype=dtype)


def sa_omega(A, Dinv, iters: int = 30):
    """(4/3) / rho(D^-1 A) via power iteration."""
    lmax = jnp.abs(power_iteration_lmax(A, Dinv, iters=iters))
    return (4.0 / 3.0) / jnp.where(lmax > 0, lmax, 1.0)


def sa_interpolation_dense(A, agg_id: jax.Array, k: int, omega=None, power_iters: int = 30):
    """Dense (n, k) Jacobi-smoothed-aggregation prolongator."""
    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    if omega is None:
        omega = sa_omega(A, Dinv, iters=power_iters)
    dtype = A.dtype if isinstance(A, jax.Array) else A.data.dtype
    T = tentative_dense(agg_id, k, dtype=dtype)
    # P = T - omega * Dinv (A T)
    return T - omega * Dinv[:, None] * spmm(A, T)


def smoothed_aggregation(A: CSR, agg_id: jax.Array, k: int, omega=None, power_iters: int = 30) -> CSR:
    """Sparse Jacobi-smoothed-aggregation prolongator with A's pattern.

    (I - omega D^-1 A) has A's sparsity; right-multiplying by the
    aggregation operator maps each column j to column agg_id[j] — so P is
    exactly A's pattern with remapped (possibly duplicated) column ids.
    Duplicates are left in place: every product in this library sums
    duplicate coordinates, so no coalesce is needed on the hot path.
    """
    n = A.shape[0]
    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    if omega is None:
        omega = sa_omega(A, Dinv, iters=power_iters)
    live = A.mask
    rsafe = jnp.minimum(A.row, n - 1)
    s_data = -omega * Dinv[rsafe] * A.data
    s_data = jnp.where(live & (A.row == A.col), s_data + 1.0, s_data)
    # remap columns through the aggregate assignment
    new_col = agg_id[A.col].astype(jnp.int32)
    assigned = new_col < k
    row = jnp.where(live & assigned, A.row, n)
    col = jnp.where(live & assigned, new_col, 0)
    data = jnp.where(live & assigned, s_data, 0.0)
    return CSR(data, row, col, A.indptr, (n, k), A.nnz)
