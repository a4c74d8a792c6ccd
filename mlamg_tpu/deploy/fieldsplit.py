"""Schur-complement fieldsplit solver for saddle-point systems.

Role of the PETSc fieldsplit configuration the reference drives its
Navier-Stokes solves with (demos/unsteady-cylflow.py:67-92): FGMRES on the
block system [[F, B^T], [B, 0]] right-preconditioned by a full Schur
factorization

    M^-1 [r_u; r_p]:  u* = F^-1 r_u
                      p  = -S^-1 (r_p - B u*)
                      u  = u* - F^-1 B^T p

with F^-1 approximated by a dense LU or an AMG preconditioner and S^-1 by
PCDR / learned AMG / SA (the pluggable 'fieldsplit_1' role).  The entire
outer Krylov loop is the jitted FGMRES from mlamg_tpu.mg.krylov.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops import matmul
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.mg.krylov import fgmres


class SchurFieldsplitSolver:
    def __init__(
        self,
        system,
        schur_pc: Callable,
        momentum_solver: Callable | None = None,
        dtype=jnp.float32,
        momentum_bs: int | None = None,
    ):
        """``schur_pc(r_p) -> ~S^-1 r_p``; ``momentum_solver(r_u) -> ~F^-1 r_u``
        (defaults to a dense LU of F).

        ``momentum_bs``: store the velocity block F as BSR with this block
        size (2/3 for 2-D/3-D vector dofs) — the PETSc-MatBSR role; one
        index per bs x bs block and a batched-matmul SpMV."""
        self.sys = system
        if momentum_bs:
            from mlamg_tpu.ops.bsr import BSR

            self.F = BSR.from_scipy(system.F, bs=momentum_bs, dtype=dtype)
        else:
            self.F = CSR.from_scipy(system.F, dtype=dtype)
        self.B = CSR.from_scipy(system.B, dtype=dtype)
        self.n_u = system.n_u
        self.n_p = system.n_p
        if momentum_solver is None:
            lu = CoarseSolver.factor(jnp.asarray(system.F.toarray(), dtype))
            momentum_solver = lu.solve
        self.momentum_solver = momentum_solver
        self.schur_pc = schur_pc
        C = getattr(system, "C", None)
        self.C = CSR.from_scipy(C, dtype=dtype) if C is not None else None

    def matvec(self, x: jax.Array) -> jax.Array:
        u, p = x[: self.n_u], x[self.n_u :]
        ru = matmul.spmv(self.F, u) + matmul.spmv_t(self.B, p)
        rp = matmul.spmv(self.B, u)
        if self.C is not None:
            rp = rp - matmul.spmv(self.C, p)
        return jnp.concatenate([ru, rp])

    def preconditioner(self, r: jax.Array) -> jax.Array:
        ru, rp = r[: self.n_u], r[self.n_u :]
        u_star = self.momentum_solver(ru)
        rp_hat = rp - matmul.spmv(self.B, u_star)
        p = -self.schur_pc(rp_hat)
        u = u_star - self.momentum_solver(matmul.spmv_t(self.B, p))
        return jnp.concatenate([u, p])

    def solve(self, b=None, tol: float = 1e-8, restart: int = 30, max_restarts: int = 20):
        """Returns (x, residual_history, iterations)."""
        if b is None:
            b = jnp.asarray(self.sys.rhs(), self.F.data.dtype)

        class _Op:
            shape = (self.n_u + self.n_p,) * 2

        op = _Op()
        mv = self.matvec
        x, hist, iters = fgmres(
            _CallableOp(mv, self.n_u + self.n_p),
            b,
            M=self.preconditioner,
            restart=restart,
            max_restarts=max_restarts,
            tol=tol,
        )
        return x, hist, iters


class _CallableOp:
    """Adapter: lets mg.krylov drive an operator given as a matvec."""

    def __init__(self, mv, n):
        self._mv = mv
        self.shape = (n, n)

    def __matmul__(self, x):
        return self._mv(x)
