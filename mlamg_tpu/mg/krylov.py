"""Preconditioned Krylov solvers (jitted).

Role of PETSc KSP in the reference deployment stack
(ns/preconditioner/MLAMG.py, demos/unsteady-cylflow.py:67-92): CG for SPD
systems and flexible GMRES for nonsymmetric systems with a (possibly
nonlinear / iterative) preconditioner such as a learned-AMG V-cycle.
Fixed-size Krylov buffers, ``lax.while_loop`` outer iterations — one XLA
program per solve.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import matmul
from mlamg_tpu.ops.sparse import CSR, ELL


def _mv(A, x):
    if isinstance(A, (CSR, ELL)):
        return matmul.spmv(A, x)
    return A @ x


def pcg(A, b, x0=None, *, M: Callable | None = None, tol: float = 1e-8, max_iter: int = 500):
    """Preconditioned conjugate gradients. Returns (x, res_history, iters)."""
    n = b.shape[0]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = (lambda r: r) if M is None else M

    r0 = b - _mv(A, x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    hist0 = jnp.zeros((max_iter,), b.dtype)
    bnorm = jnp.linalg.norm(b)
    stop = tol * jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        _, r, _, _, i, done, _ = state
        return (~done) & (i < max_iter)

    def body(state):
        x, r, p, rz, i, _, hist = state
        Ap = _mv(A, p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rn = jnp.linalg.norm(r)
        hist = hist.at[i].set(rn)
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, i + 1, rn <= stop, hist

    x, _, _, _, iters, _, hist = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, 0, jnp.bool_(False), hist0)
    )
    return x, hist, iters


def fgmres(
    A,
    b,
    x0=None,
    *,
    M: Callable | None = None,
    restart: int = 30,
    max_restarts: int = 20,
    tol: float = 1e-8,
):
    """Flexible GMRES(restart) with right preconditioning.

    ``M`` may change between applications (e.g. an AMG cycle run to a
    tolerance) — the flexible variant stores Z = M(V) explicitly.
    Returns (x, res_history, total_iters); history has one entry per outer
    (restart) cycle.
    """
    n = b.shape[0]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = (lambda r: r) if M is None else M
    m = restart
    bnorm = jnp.linalg.norm(b)
    stop = tol * jnp.where(bnorm > 0, bnorm, 1.0)

    def arnoldi_cycle(x):
        r = b - _mv(A, x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(r / jnp.where(beta > 0, beta, 1.0))
        Z = jnp.zeros((m, n), b.dtype)
        H = jnp.zeros((m + 1, m), b.dtype)

        def arnoldi_step(j, carry):
            V, Z, H = carry
            z = M(V[j])
            w = _mv(A, z)
            # modified Gram-Schmidt against v_0..v_j (mask the rest)
            def mgs(i, carry):
                w, H = carry
                keep = i <= j
                h = jnp.where(keep, jnp.vdot(V[i], w), 0.0)
                return w - h * V[i], H.at[i, j].set(h)

            w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            hnext = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hnext)
            V = V.at[j + 1].set(w / jnp.where(hnext > 1e-30, hnext, 1.0))
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, Z, H))
        # least squares min ||beta e1 - H y||
        e1 = jnp.zeros((m + 1,), b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1, rcond=None)
        x = x + Z.T @ y
        return x

    hist0 = jnp.zeros((max_restarts,), b.dtype)

    def cond(state):
        _, i, done, _ = state
        return (~done) & (i < max_restarts)

    def body(state):
        x, i, _, hist = state
        x = arnoldi_cycle(x)
        rn = jnp.linalg.norm(b - _mv(A, x))
        hist = hist.at[i].set(rn)
        return x, i + 1, rn <= stop, hist

    x, outers, _, hist = jax.lax.while_loop(
        cond, body, (x0, 0, jnp.bool_(False), hist0)
    )
    return x, hist, outers * m
