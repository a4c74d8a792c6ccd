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
    meta_fields=["singular"],
)
@dataclasses.dataclass(frozen=True)
class CoarseSolver:
    """LU-factorized dense coarse operator."""

    lu: jax.Array
    piv: jax.Array
    singular: bool

    @staticmethod
    def factor(A_H: jax.Array, singular: bool = False) -> "CoarseSolver":
        if singular:
            k = A_H.shape[0]
            one = jnp.ones((k, 1), A_H.dtype)
            A_H = jnp.block([[A_H, one], [one.T, jnp.zeros((1, 1), A_H.dtype)]])
        lu, piv = jsl.lu_factor(A_H)
        return CoarseSolver(lu, piv, singular)

    def solve(self, r: jax.Array) -> jax.Array:
        """Solve A_H e = r (r may be (k,) or (k, t))."""
        if self.singular:
            pad_shape = (1,) + r.shape[1:]
            r = jnp.concatenate([r, jnp.zeros(pad_shape, r.dtype)], axis=0)
        e = jsl.lu_solve((self.lu, self.piv), r)
        if self.singular:
            e = e[:-1]
        return e
