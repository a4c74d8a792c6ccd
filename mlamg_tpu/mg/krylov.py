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

    Deployment-grade internals (PETSc KSPFGMRES semantics): the Arnoldi
    factorization is kept upper-triangular with Givens rotations, so the
    residual norm is available at every *inner* step for free; the inner
    loop exits on convergence or (happy) breakdown instead of always
    running ``restart`` steps, and the final y solves the triangular
    system by masked back-substitution (no per-cycle lstsq).

    Returns (x, res_history, total_iters); history has one entry per inner
    iteration (zeros beyond ``total_iters``).
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
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(
            r / jnp.where(beta > 0, beta, 1.0)
        )
        Z = jnp.zeros((m, n), b.dtype)
        R = jnp.zeros((m + 1, m), b.dtype)  # rotated (triangular) H
        cs = jnp.zeros((m,), b.dtype)
        sn = jnp.zeros((m,), b.dtype)
        g = jnp.zeros((m + 1,), b.dtype).at[0].set(beta)
        res0 = jnp.zeros((m,), b.dtype)

        def cond(carry):
            _, _, _, _, _, _, j, done, _ = carry
            return (~done) & (j < m)

        def step(carry):
            V, Z, R, cs, sn, g, j, _, res = carry
            z = M(V[j])
            w = _mv(A, z)

            # modified Gram-Schmidt against v_0..v_j (mask the rest)
            def mgs(i, carry):
                w, h = carry
                keep = i <= j
                hi = jnp.where(keep, jnp.vdot(V[i], w), 0.0)
                return w - hi * V[i], h.at[i].set(hi)

            w, h = jax.lax.fori_loop(
                0, m + 1, mgs, (w, jnp.zeros((m + 1,), b.dtype))
            )
            hnext = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hnext)
            V = V.at[j + 1].set(w / jnp.where(hnext > 1e-30, hnext, 1.0))
            Z = Z.at[j].set(z)

            # apply the previous rotations to the new column
            def rot(i, h):
                keep = i < j
                hi = jnp.where(keep, cs[i] * h[i] + sn[i] * h[i + 1], h[i])
                hi1 = jnp.where(keep, -sn[i] * h[i] + cs[i] * h[i + 1], h[i + 1])
                return h.at[i].set(hi).at[i + 1].set(hi1)

            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            dsafe = jnp.where(denom > 0, denom, 1.0)
            c = jnp.where(denom > 0, h[j] / dsafe, 1.0)
            s = jnp.where(denom > 0, h[j + 1] / dsafe, 0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            R = R.at[:, j].set(h)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            rnorm = jnp.abs(g[j + 1])
            res = res.at[j].set(rnorm)
            done = (rnorm <= stop) | (hnext <= 1e-30)
            return V, Z, R, cs, sn, g, j + 1, done, res

        V, Z, R, cs, sn, g, j_used, done, res = jax.lax.while_loop(
            cond, step,
            (V, Z, R, cs, sn, g, 0, beta <= stop, res0),
        )

        # masked back-substitution: R[:j_used, :j_used] y = g[:j_used]
        def back(t, y):
            i = m - 1 - t
            active = i < j_used
            s = g[i] - jnp.dot(R[i, :], y)
            rii = R[i, i]
            yi = s / jnp.where(jnp.abs(rii) > 1e-30, rii, 1.0)
            return y.at[i].set(jnp.where(active, yi, 0.0))

        y = jax.lax.fori_loop(0, m, back, jnp.zeros((m,), b.dtype))
        x = x + Z.T @ y
        return x, j_used, res, done & (jnp.abs(g[jnp.minimum(j_used, m)]) <= stop)

    hist0 = jnp.zeros((max_restarts * m,), b.dtype)

    def cond(state):
        _, i, _, done, _ = state
        return (~done) & (i < max_restarts)

    def body(state):
        x, i, iters, _, hist = state
        x, j_used, res, _ = arnoldi_cycle(x)
        idx = iters + jnp.arange(m)
        hist = hist.at[idx].set(jnp.where(jnp.arange(m) < j_used, res, 0.0))
        rn = jnp.linalg.norm(b - _mv(A, x))
        return x, i + 1, iters + j_used, rn <= stop, hist

    x, outers, iters, _, hist = jax.lax.while_loop(
        cond, body, (x0, 0, 0, jnp.bool_(False), hist0)
    )
    return x, hist, iters
