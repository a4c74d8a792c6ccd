"""Differentiable AMG losses (role of ns/model/loss.py).

``amg_loss`` measures interpolation quality by *running* the two-level
iteration on a batch of test vectors and softmax-weighting the per-vector
convergence factors (reference loss.py:32-96).  Everything is dense-coarse
and differentiable end to end: the coarse solve is an MXU LU solve whose
gradient flows via jax.scipy (replacing the KLU ``torch_sparse_solve``
dependency), and sparse products differentiate w.r.t. values through the
segment ops.  Neumann (constant-nullspace) systems use the same Lagrange
bordering as the reference (loss.py:11-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops.matmul import spmm, spmm_t, rap_dense, spmv


def make_test_vectors(n: int, num: int, key=None, dtype=jnp.float32) -> jax.Array:
    """(n, num) unit-norm gaussian test vectors (reference loss.py:57-61)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, num), dtype)
    return x / jnp.linalg.norm(x, axis=0, keepdims=True)


def amg_loss(
    P,
    A,
    test_vecs,
    tot_num_loop: int = 5,
    no_prerelax: int = 1,
    no_postrelax: int = 1,
    neumann_solve_fix: bool = False,
    omega: float = 2.0 / 3.0,
    ridge: float = 0.0,
    smooth_fn=None,
):
    """Softmax-weighted convergence-factor loss of interpolation ``P``.

    P : CSR (n, k) or dense (n, k); A : CSR (n, n); test_vecs : (n, t).
    Fully differentiable w.r.t. P values (and A values).

    ``ridge`` adds ``ridge * mean(diag(A_H))`` to the coarse diagonal:
    candidate P's with (near-)dead columns then yield a large-but-finite,
    still-differentiable loss instead of a NaN from the singular LU — the
    soft-pipeline trainer relies on this to steer out of degenerate
    interpolations (default 0.0 = exact reference semantics).

    ``smooth_fn`` optionally replaces the weighted-Jacobi error sweep with a
    custom (n, t) -> (n, t) error smoother (e.g. multicolor Gauss-Seidel to
    match the measured two-level cycle); it must be differentiable in its
    input and is applied ``no_prerelax``/``no_postrelax`` times.
    """
    d = A.diagonal()
    Dinv = omega / jnp.where(d != 0, d, 1.0)

    A_H = rap_dense(A, P)
    if ridge:
        k_h = A_H.shape[0]
        lam = ridge * jnp.trace(A_H) / k_h + 1e-12
        A_H = A_H + lam * jnp.eye(k_h, dtype=A_H.dtype)
    if neumann_solve_fix:
        k = A_H.shape[0]
        one = jnp.ones((k, 1), A_H.dtype)
        A_H = jnp.block([[A_H, one], [one.T, jnp.zeros((1, 1), A_H.dtype)]])

    x = test_vecs
    t = x.shape[1]

    def P_mul(v):
        return spmm(P, v) if isinstance(P, CSR) else P @ v

    def Pt_mul(v):
        return spmm_t(P, v) if isinstance(P, CSR) else P.T @ v

    if smooth_fn is None:
        smooth_fn = lambda x: x - Dinv[:, None] * spmm(A, x)

    def iteration(x):
        for _ in range(no_prerelax):
            x = smooth_fn(x)
        r_H = Pt_mul(spmm(A, x))
        if neumann_solve_fix:
            r_H = jnp.concatenate([r_H, jnp.zeros((1, t), r_H.dtype)], axis=0)
        e_H = jnp.linalg.solve(A_H, -r_H)
        if neumann_solve_fix:
            e_H = e_H[:-1]
        x = x + P_mul(e_H)
        for _ in range(no_postrelax):
            x = smooth_fn(x)
        if neumann_solve_fix:
            # project out the constant nullspace (reference loss.py:89 does
            # this unconditionally, which under-counts smooth error on
            # Dirichlet problems; here it is tied to the Neumann fix)
            x = x - jnp.mean(x, axis=0, keepdims=True)
        return x

    # Per-loop contraction ratios with renormalization: a divergent
    # candidate P grows the error geometrically, and squaring raw norms
    # overflows f32 within a few loops (NaN loss, dead gradients).  The
    # error is rescaled to unit norm after every loop; the accumulated
    # ratios give the identical convergence factor.
    ratios = []
    for _ in range(tot_num_loop + 1):
        x = iteration(x)
        nrm = jnp.linalg.norm(x, axis=0)
        ratios.append(nrm)
        x = x / jnp.maximum(nrm, 1e-30)[None, :]
    ratios = jnp.stack(ratios)  # (loops+1, t)

    n_err = 3
    # errs[-1]/errs[-n_err] == product of the last (n_err-1) ratios
    convs = jnp.prod(ratios[-(n_err - 1):], axis=0) ** (1.0 / (n_err - 1))
    return jnp.dot(jax.nn.softmax(convs), convs)


# -- energy-norm losses (role of ns/model/interpolation.py:131-158) ----------


def R_jacobi(A, omega: float = 2.0 / 3.0) -> jax.Array:
    """Dense error-propagation matrix of weighted Jacobi, I - omega D^-1 A
    (reference interpolation.py:131-141; small n only)."""
    n = A.shape[0]
    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    Ad = A.todense() if isinstance(A, CSR) else A
    return jnp.eye(n, dtype=Ad.dtype) - omega * Dinv[:, None] * Ad


def E_loss(A, P, omega: float = 2.0 / 3.0) -> jax.Array:
    """|| R (I - P (P^T A P)^-1 P^T A) R ||_F — the two-level error
    propagation energy (reference interpolation.py:143-147)."""
    n = A.shape[0]
    Ad = A.todense() if isinstance(A, CSR) else A
    Pd = P.todense() if isinstance(P, CSR) else P
    R = R_jacobi(A, omega)
    AH = Pd.T @ Ad @ Pd
    correction = jnp.eye(n, dtype=Ad.dtype) - Pd @ jnp.linalg.solve(AH, Pd.T @ Ad)
    return jnp.linalg.norm(R @ correction @ R, "fro")
