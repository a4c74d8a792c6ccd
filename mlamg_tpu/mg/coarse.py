"""Dense coarse-level solvers.

The coarse operator in the two-level regime is (k, k) with k = alpha*n —
small enough that a dense LU beats any sparse factorization on TPU (the
factorization and the solves are MXU work).  Replaces SuperLU
``factorized`` / ``lsqr`` (reference ns/lib/multigrid.py:168,179) and the
KLU batched solve in the differentiable loss (ns/model/loss.py:79; here the
solve is natively differentiable through ``jax.scipy``).

Singular (Neumann) systems use the Lagrange bordering of the reference loss
(ns/model/loss.py:11-30): solve [[A, 1], [1^T, 0]] to pin the nullspace.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lu", "piv"],
    meta_fields=["singular", "method"],
)
@dataclasses.dataclass(frozen=True)
class CoarseSolver:
    """Factorized dense coarse operator.

    ``method="lu"`` (default) stores the LU factors; each solve is two
    triangular solves — sequential work the MXU dislikes.  ``method=
    "inverse"`` stores the explicit inverse; each solve is one (k, k)
    matvec — a single MXU pass, ~an order of magnitude faster per cycle
    iteration on TPU for the k ≤ a-few-thousand coarse levels this
    framework produces.  The inverse is computed from the LU factors at
    setup; for the SPD/bordered coarse operators here (condition ~O(k))
    the f32 accuracy loss is well below smoother noise."""

    lu: jax.Array
    piv: jax.Array
    singular: bool
    method: str = "lu"

    @staticmethod
    def factor(
        A_H: jax.Array, singular: bool = False, method: str = "lu"
    ) -> "CoarseSolver":
        if singular:
            k = A_H.shape[0]
            one = jnp.ones((k, 1), A_H.dtype)
            A_H = jnp.block([[A_H, one], [one.T, jnp.zeros((1, 1), A_H.dtype)]])
        if method == "inverse":
            inv = jnp.linalg.inv(A_H)
            return CoarseSolver(inv, jnp.zeros((0,), jnp.int32), singular, method)
        lu, piv = jsl.lu_factor(A_H)
        return CoarseSolver(lu, piv, singular, method)

    def solve(self, r: jax.Array) -> jax.Array:
        """Solve A_H e = r (r may be (k,) or (k, t))."""
        if self.singular:
            pad_shape = (1,) + r.shape[1:]
            r = jnp.concatenate([r, jnp.zeros(pad_shape, r.dtype)], axis=0)
        if self.method == "inverse":
            e = self.lu @ r
        else:
            e = jsl.lu_solve((self.lu, self.piv), r)
        if self.singular:
            e = e[:-1]
        return e
