"""AMG cycles: jitted two-level solver and multilevel V-cycle.

``twolevel_solve`` reproduces the observable contract of the reference's
``amg_2_v`` (ns/lib/multigrid.py:111-210): iterate (pre-smooth, coarse
correction, post-smooth), track a residual- or error-norm history, stop on
tolerance or ``max_iter``, and report the geometric-mean convergence factor

    conv = (err[-1] / err[-err_n]) ** (1 / (err_n - 1)),
    err_n = min(iters // 3, 10)                    (multigrid.py:196-208)

Differences by design (SURVEY.md §7): smoothing is weighted Jacobi or
Chebyshev (TPU-parallel; the reference itself validates Jacobi parity in
``amg_2_v_torch``, multigrid.py:213-245) with multicolor Gauss-Seidel
available for parity experiments; the coarse solve is a dense MXU LU; the
whole loop is a single ``lax.while_loop`` — one XLA program, no host round
trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR, ELL
from mlamg_tpu.ops import matmul
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.mg.smoothers import jacobi, chebyshev, multicolor_gauss_seidel


def _is_factored(P):
    from mlamg_tpu.mg.factored import BilinearP2D, FactoredSA

    return isinstance(P, (FactoredSA, BilinearP2D))


def _interp(P, v):
    """P @ v for dense, sparse, or factored P."""
    if _is_factored(P):
        return P.interp(v)
    if isinstance(P, (CSR, ELL)):
        return matmul.spmv(P, v)
    return P @ v


def _restrict(P, v):
    """P.T @ v for dense, sparse, or factored P."""
    if _is_factored(P):
        return P.restrict(v)
    if isinstance(P, (CSR, ELL)):
        return matmul.spmv_t(P, v)
    return P.T @ v


def coarse_operator(A, P) -> jax.Array:
    """Dense Galerkin coarse operator P^T A P."""
    if _is_factored(P):
        from mlamg_tpu.mg.factored import coarse_operator_factored

        return coarse_operator_factored(A, P)
    return matmul.rap_dense(A, P)


def twolevel_solve(
    A,
    P,
    b,
    x0,
    *,
    pre_smoothing_steps: int = 1,
    post_smoothing_steps: int = 1,
    jacobi_weight: float = 0.666,
    res_tol: float | None = None,
    error_tol: float | None = None,
    max_iter: int = 500,
    singular: bool = False,
    smoother: str = "jacobi",
    smoother_args: dict | None = None,
    coarse: CoarseSolver | None = None,
    fused_jacobi: bool | None = None,
):
    """Two-level AMG solve; returns (x, conv_factor, err_history, iters).

    ``err_history`` is a fixed (max_iter,) buffer; entries past ``iters``
    are zero (static shapes under jit).

    ``fused_jacobi`` rewrites each Jacobi sweep as the affine map
    x' = (I - w D^-1 A) x + w D^-1 b, precomputed once per solve — on TPU
    with a blocked DIA operator every sweep is then one fused Pallas pass
    (see ops.pallas_kernels).  Default: auto (on exactly in that regime);
    mathematically identical, but rounding differs slightly from the
    unfused form.
    """
    from mlamg_tpu.ops.dia import DIA, dia_jacobi_operator

    if res_tol is None and error_tol is None:
        raise RuntimeError("One of res_tol or error_tol must be set!")
    tol = res_tol if res_tol is not None else error_tol
    use_res = res_tol is not None

    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    if coarse is None:
        A_H = coarse_operator(A, P)
        coarse = CoarseSolver.factor(A_H, singular=singular)

    smoother_args = smoother_args or {}
    if smoother == "chebyshev" and "lmax" not in smoother_args:
        # default eigenvalue bound by power iteration on D^-1 A (role of the
        # reference's ARPACK eigs at utils/train_one_sample.py:133)
        from mlamg_tpu.graph.strength import power_iteration_lmax

        smoother_args = dict(smoother_args)
        smoother_args["lmax"] = jnp.abs(power_iteration_lmax(A, Dinv))

    if fused_jacobi is None:
        fused_jacobi = (
            isinstance(A, DIA)
            and A.data.ndim == 3
            and jax.default_backend() == "tpu"
        )
    M_fused = None
    if fused_jacobi and smoother == "jacobi" and isinstance(A, DIA):
        M_fused = dia_jacobi_operator(A, Dinv, jacobi_weight)
        c_fused = jacobi_weight * Dinv * b

    def smooth(x, b, nu):
        if nu == 0:
            return x
        if M_fused is not None:
            return jax.lax.fori_loop(
                0, nu, lambda _, v: matmul.spmv_affine(M_fused, v, c=c_fused), x
            )
        if smoother == "jacobi":
            return jacobi(A, b, x, Dinv, omega=jacobi_weight, nu=nu)
        if smoother == "chebyshev":
            return chebyshev(A, b, x, smoother_args["lmax"], degree=nu + 1, Dinv=Dinv)
        if smoother == "multicolor_gs":
            return multicolor_gauss_seidel(
                A, b, x, smoother_args["colors"], smoother_args["num_colors"], nu=nu
            )
        raise ValueError(f"unknown smoother {smoother}")

    err0 = jnp.zeros((max_iter,), x0.dtype)

    def cond(state):
        x, err, i, done = state
        return (~done) & (i < max_iter)

    def body(state):
        x0_, err0_, i0, done = state
        x = smooth(x0_, b, pre_smoothing_steps)
        r = matmul.spmv_affine(A, x, c=b, alpha=-1.0)  # b - A x, fused
        e_H = coarse.solve(_restrict(P, r))
        x = x + _interp(P, e_H)
        x = smooth(x, b, post_smoothing_steps)
        if singular:
            x = x - jnp.mean(x)
        e = (
            jnp.linalg.norm(matmul.spmv_affine(A, x, c=b, alpha=-1.0))
            if use_res
            else jnp.linalg.norm(x)
        )
        # freeze converged instances: under vmap (grid/population batching)
        # the loop runs until every instance converges, and late sweeps must
        # not advance the already-converged ones (their iters/err history —
        # and hence the conv-factor readout — would silently change)
        x = jnp.where(done, x0_, x)
        err = jnp.where(done, err0_, err0_.at[i0].set(e))
        i = jnp.where(done, i0, i0 + 1)
        return x, err, i, done | (e <= tol)

    x, err, iters, _ = jax.lax.while_loop(
        cond, body, (x0, err0, jnp.int32(0), jnp.bool_(False))
    )

    conv = _conv_factor(err, iters)
    return x, conv, err, iters


def _conv_factor(err: jax.Array, iters: jax.Array) -> jax.Array:
    """Geometric-mean convergence factor with the reference's readout
    semantics (multigrid.py:196-208), plus its failure convention: a NaN/Inf
    history (diverged smoother, singular coarse operator) scores 1.0 — the
    "no convergence" penalty the reference applies on solver failure
    (multigrid.py:167-170, utils/train_dataset.py:116)."""
    err_n = jnp.minimum(iters // 3, 10)
    last = err[jnp.maximum(iters - 1, 0)]
    base = err[jnp.maximum(iters - err_n, 0)]
    conv = jnp.where(
        (iters >= 6) & (base > 0),
        (last / jnp.where(base > 0, base, 1.0))
        ** (1.0 / jnp.maximum(err_n - 1, 1)),
        0.0,
    )
    failed = ~jnp.isfinite(last) | ~jnp.isfinite(base)
    conv = jnp.where(failed | ~jnp.isfinite(conv), 1.0, conv)
    return conv


# ---------------------------------------------------------------------------
# Multilevel hierarchy
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["As", "Ps", "Dinvs", "coarse", "lmaxs"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    """Static-depth multilevel hierarchy (level 0 = finest).

    ``As[l]`` sparse operator, ``Ps[l]`` prolongator level l+1 -> l,
    ``coarse`` dense LU of the coarsest operator.  ``lmaxs[l]`` (optional)
    bounds the spectrum of D^-1 A at level l, enabling the Chebyshev
    smoother in :func:`vcycle`.
    """

    As: tuple
    Ps: tuple
    Dinvs: tuple
    coarse: CoarseSolver
    lmaxs: tuple = ()

    @property
    def num_levels(self) -> int:
        return len(self.As)


def build_hierarchy(
    A: CSR,
    *,
    alpha: float = 0.1,
    max_levels: int = 3,
    min_coarse: int = 64,
    strength_kind: str = "abs",
    width: int | None = None,
    key=None,
    sparse_levels: int = 0,
) -> Hierarchy:
    """Aggregation-based setup: strength -> Lloyd -> SA-smoothed P -> RAP.

    Host-driven loop (setup phase); every produced operator is a device
    array / container, and the resulting hierarchy solve is fully jitted.
    By default coarse operators are kept dense from the first coarsening on
    — on TPU the (k, k) dense level is both the fastest and the simplest
    correct choice until k grows past a few thousand.  For large problems,
    ``sparse_levels`` keeps the first N coarse operators sparse, forming
    them with the static-bound SpGEMM triple product instead of dense RAP.
    """
    import numpy as np
    from mlamg_tpu.graph.lloyd import lloyd_aggregation
    from mlamg_tpu.graph.strength import strength_measure
    from mlamg_tpu.mg.interp import sa_interpolation_dense, smoothed_aggregation

    if key is None:
        key = jax.random.PRNGKey(0)

    As: list = [A]
    Ps: list = []
    Dinvs: list = []
    level_A: Any = A
    for lvl in range(max_levels - 1):
        n = level_A.shape[0]
        if n <= min_coarse:
            break
        k = int(np.ceil(alpha * n))
        if isinstance(level_A, CSR):
            lvl_width = int(np.max(np.diff(np.asarray(level_A.indptr))))
            C = strength_measure(level_A, strength_kind, width=lvl_width)
            d = level_A.diagonal()
        else:
            # dense level: aggregate on the dense adjacency converted to CSR
            import scipy.sparse as sp

            C = strength_measure(
                CSR.from_scipy(
                    sp.csr_matrix(np.asarray(level_A)), dtype=level_A.dtype
                ),
                strength_kind,
                width=width,
            )
            d = jnp.diagonal(level_A)
        key, sub = jax.random.split(key)
        agg_id, roots, _ = lloyd_aggregation(C, ratio=alpha, key=sub)
        Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
        Dinvs.append(Dinv)
        if lvl < sparse_levels and isinstance(level_A, CSR):
            # sparse Galerkin product with host-computed static bounds.
            # The bounds are heuristic; overflow is detected on device and
            # the product re-run with a doubled capacity (setup phase, so
            # the recompile is acceptable) — truncation is never silent.
            P = smoothed_aggregation(level_A, agg_id, k)
            p_width = lvl_width  # P shares A's pattern with remapped columns
            nnz_out = min(4 * level_A.nnz_pad, k * k)
            while True:
                A_next, overflow = matmul.rap_fused(
                    level_A, P, k=k, nnz_out=nnz_out, p_width=p_width,
                    return_overflow=True,
                )
                if not bool(overflow):
                    break
                nnz_out *= 2
        else:
            P = sa_interpolation_dense(level_A, agg_id, k)
            A_next = matmul.rap_dense(level_A, P)
        Ps.append(P)
        As.append(A_next)
        level_A = A_next

    # Dinv for the coarsest smoothing level is unused; factor coarsest dense.
    A_c = As[-1]
    A_c_dense = A_c if isinstance(A_c, jax.Array) else A_c.todense()
    coarse = CoarseSolver.factor(A_c_dense)
    return Hierarchy(tuple(As[:-1]), tuple(Ps), tuple(Dinvs), coarse)


def _level_spmv(A, x):
    if isinstance(A, jax.Array):
        return A @ x
    return matmul.spmv(A, x)


def vcycle(h: Hierarchy, b: jax.Array, x: jax.Array, *, omega: float = 0.666, nu=1,
           smoother: str = "jacobi", lmin_frac: float = 1.0 / 15.0,
           gamma: int = 1):
    """One cycle through the hierarchy (static recursion depth).

    ``smoother="chebyshev"`` (requires ``h.lmaxs``) runs a degree-``nu+1``
    Chebyshev polynomial per pre/post smooth — substantially stronger than
    Jacobi for the aggressive box coarsening of the structured hierarchy.

    ``nu`` may be an int (all levels) or a per-level sequence — the fine
    level carries ~70% of a side-2 hierarchy's cycle cost, so e.g.
    ``nu=(1, 2, 2, ...)`` trades a little convergence for a much cheaper
    fine sweep.

    ``gamma=1`` is a V-cycle, ``gamma=2`` a W-cycle: with >=16x coarsening
    per level the W-cycle costs only ~1.2x a V-cycle (each coarse level is
    an order of magnitude cheaper) while removing the V-cycle's depth
    degradation (the standard aggressive-aggregation fix, cf. uvcycle)."""

    def descend(l, b, x):
        A = h.As[l]
        Dinv = h.Dinvs[l]
        nu_l = nu if isinstance(nu, int) else nu[min(l, len(nu) - 1)]

        def smooth(x):
            if smoother == "chebyshev":
                from mlamg_tpu.mg.smoothers import chebyshev

                return chebyshev(
                    A, b, x, 1.1 * h.lmaxs[l], lmin_frac=lmin_frac,
                    degree=nu_l + 1, Dinv=Dinv,
                )

            def body(_, x):
                return x + omega * Dinv * (b - _level_spmv(A, x))

            return jax.lax.fori_loop(0, nu_l, body, x)

        x = smooth(x)
        r = b - _level_spmv(A, x)
        r_H = _restrict(h.Ps[l], r)
        if l + 1 == len(h.As):
            e_H = h.coarse.solve(r_H)
        else:
            e_H = descend(l + 1, r_H, jnp.zeros_like(r_H))
            for _ in range(gamma - 1):
                e_H = descend(l + 1, r_H, e_H)
        x = x + _interp(h.Ps[l], e_H)
        return smooth(x)

    return descend(0, b, x)


def vcycle_solve(
    h: Hierarchy,
    b: jax.Array,
    x0: jax.Array,
    *,
    res_tol: float = 1e-10,
    max_iter: int = 200,
    omega: float = 0.666,
    nu: int = 1,
):
    """Iterated V-cycles with the same convergence-factor readout as
    :func:`twolevel_solve`. Returns (x, conv_factor, err, iters)."""
    A = h.As[0]
    err0 = jnp.zeros((max_iter,), x0.dtype)

    def cond(state):
        _, _, i, done = state
        return (~done) & (i < max_iter)

    def body(state):
        x, err, i, _ = state
        x = vcycle(h, b, x, omega=omega, nu=nu)
        e = jnp.linalg.norm(b - _level_spmv(A, x))
        err = err.at[i].set(e)
        return x, err, i + 1, e <= res_tol

    x, err, iters, _ = jax.lax.while_loop(cond, body, (x0, err0, 0, jnp.bool_(False)))
    return x, _conv_factor(err, iters), err, iters
