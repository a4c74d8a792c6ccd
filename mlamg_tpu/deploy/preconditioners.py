"""Deployable preconditioners (role of ns/preconditioner/*).

- :class:`LearnedAMGPreconditioner` — the MLAMG role
  (ns/preconditioner/MLAMG.py): greedy C/F coarsening, a trained
  C/F-interpolation network builds P, dense-LU coarse operator, and
  ``apply`` runs the two-level cycle to a residual tolerance.  The whole
  apply is one jitted XLA program (the reference re-enters python + scipy
  per Krylov iteration).
- :class:`SAPreconditioner` — the PyAMG-wrapper role
  (ns/preconditioner/PyAMG.py): a classical smoothed-aggregation multilevel
  hierarchy applied as V-cycles.
- :class:`PCDRPreconditioner` — pressure-convection-diffusion-reaction
  Schur approximation (ns/preconditioner/PCDR.py):
  S^-1 ~ Kp^-1 Fp Mp^-1 + Rp^-1 with Rp = dt * B D^-1 B^T.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops import matmul
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.mg.cycle import build_hierarchy, vcycle
from mlamg_tpu.deploy.options import Options


class LearnedAMGPreconditioner:
    """Two-level learned AMG as a preconditioner callback.

    Options (prefix ``mlamg_``, matching MLAMG.py:61-67): ``amg_rtol``
    (default 1e-8), ``greedy_theta`` (0.56), ``jacobi_weight`` (2/3),
    ``max_iter`` (100), ``pnet_model`` (checkpoint path; optional — without
    it a classical Jacobi-SA P on the greedy splitting is used).
    """

    def __init__(self, A_scipy, options: Options | None = None, net=None, net_params=None, dtype=jnp.float32):
        from mlamg_tpu.graph.coarsening import greedy_coarsening
        from mlamg_tpu.models.cf_interp import CFInterpolationNetwork, cf_rank

        opts = (options or Options()).scoped("mlamg_")
        self.rtol = opts.get_scalar("amg_rtol", 1e-8)
        self.theta = opts.get_scalar("greedy_theta", 0.56)
        self.omega = opts.get_scalar("jacobi_weight", 2.0 / 3.0)
        self.max_iter = opts.get_int("max_iter", 100)
        model_path = opts.get_string("pnet_model", "")

        n = A_scipy.shape[0]
        self.A = CSR.from_scipy(A_scipy, dtype=dtype)
        d = A_scipy.diagonal()
        self.Dinv = jnp.asarray(self.omega / np.where(d != 0, d, 1.0), dtype)

        # C/F splitting + interpolation
        _, F, C = greedy_coarsening(A_scipy, self.theta)
        is_coarse = np.zeros(n, bool)
        is_coarse[C] = True
        c_rank, num_c = cf_rank(is_coarse)
        self.num_coarse = num_c

        if net is None and model_path:
            from mlamg_tpu.utils.checkpoint import load_checkpoint

            ck = load_checkpoint(model_path)
            nc = (ck.get("extra") or {}).get("net_config") or {}
            net = CFInterpolationNetwork(
                **({"dims": tuple(nc["dims"]), "K": int(nc["K"]),
                    "row_normalize": bool(nc["row_normalize"])} if nc else {})
            )
            net_params = ck["best_params"]
        if net is not None:
            P = net.apply(
                net_params, self.A, jnp.asarray(is_coarse), jnp.asarray(c_rank), num_c
            )
        else:
            # classical fallback: unit-weight C/F interpolation on the
            # greedy splitting, Jacobi-smoothed
            from mlamg_tpu.mg.interp import smoothed_aggregation

            agg_id = jnp.asarray(c_rank)  # every node tied to a coarse col
            P = smoothed_aggregation(self.A, agg_id, num_c)
        self.P = P
        A_H = matmul.rap_dense(self.A, P)
        self.coarse = CoarseSolver.factor(A_H)
        self._apply = self._build_apply()

    def _build_apply(self):
        A, P, Dinv, coarse = self.A, self.P, self.Dinv, self.coarse
        rtol, max_iter = self.rtol, self.max_iter

        @jax.jit
        def apply(b, x0):
            def jac(x, nu):
                def body(_, x):
                    return x + Dinv * (b - matmul.spmv(A, x))

                return jax.lax.fori_loop(0, nu, body, x)

            def cond(state):
                x, i, done = state
                return (~done) & (i < max_iter)

            def body(state):
                x, i, _ = state
                x = jac(x, 1)
                r = b - matmul.spmv(A, x)
                x = x + matmul.spmv(P, coarse.solve(matmul.spmv_t(P, r)))
                x = jac(x, 1)
                done = jnp.linalg.norm(b - matmul.spmv(A, x)) <= rtol
                return x, i + 1, done

            x, _, _ = jax.lax.while_loop(cond, body, (x0, 0, jnp.bool_(False)))
            return x

        return apply

    def __call__(self, b: jax.Array) -> jax.Array:
        return self._apply(b, jnp.zeros_like(b))


class SAPreconditioner:
    """Smoothed-aggregation multilevel V-cycles as a preconditioner
    (role of ns/preconditioner/PyAMG.py).  Options prefix ``pyamg_``:
    ``amg_max_levels`` (3), ``cycles`` (1), ``alpha`` (0.1)."""

    def __init__(self, A_scipy, options: Options | None = None, dtype=jnp.float32):
        opts = (options or Options()).scoped("pyamg_")
        max_levels = opts.get_int("amg_max_levels", 3)
        self.cycles = opts.get_int("cycles", 1)
        alpha = opts.get_scalar("alpha", 0.1)
        width = int(np.diff(A_scipy.indptr).max())
        self.A = CSR.from_scipy(A_scipy, dtype=dtype)
        self.h = build_hierarchy(
            self.A, alpha=alpha, max_levels=max_levels, width=width
        )
        cycles = self.cycles
        h = self.h

        @jax.jit
        def apply(b):
            x = jnp.zeros_like(b)

            def body(_, x):
                return vcycle(h, b, x)

            return jax.lax.fori_loop(0, cycles, body, x)

        self._apply = apply

    def __call__(self, b: jax.Array) -> jax.Array:
        return self._apply(b)


class PCDRPreconditioner:
    """S^-1 ~ Kp^-1 Fp Mp^-1 + Rp^-1, Rp = dt * B diag(Mu)^-1 B^T
    (reference PCDR.py:139-186).  All sub-solves are dense MXU LU
    (pressure spaces are small relative to velocity)."""

    def __init__(self, system, dtype=jnp.float32):
        import scipy.sparse as sp

        Mp = system.Mp
        Kp = system.Ap.copy()
        Fp = system.Fp
        # On flows with an open boundary the pressure is pinned there by
        # the natural outflow condition; the PCD operators must carry the
        # same pin (Dirichlet rows/cols) or the Lagrange-pinned solves
        # annihilate a mode the true Schur complement doesn't — making the
        # preconditioned operator singular and stalling FGMRES.  Enclosed
        # flows (no ``pressure_pin_nodes``) keep the Lagrange pinning.
        pin = np.asarray(getattr(system, "pressure_pin_nodes", []), np.int64)
        singular = pin.size == 0

        def apply_pin(A):
            if singular:
                return A
            A = A.tolil()
            A[pin, :] = 0.0
            A[:, pin] = 0.0
            A[pin, pin] = 1.0
            return A.tocsr()

        Kp = apply_pin(Kp)
        self.Fp = CSR.from_scipy(Fp, dtype=dtype)
        self.Mp_solver = CoarseSolver.factor(jnp.asarray(Mp.toarray(), dtype))
        self.Kp_solver = CoarseSolver.factor(
            jnp.asarray(Kp.toarray(), dtype), singular=singular
        )
        if system.dt is not None:
            Dinv = sp.diags(1.0 / system.Mu_diag)
            Rp = (system.B @ Dinv @ system.B.T) * system.dt
            # equal-order (P1-P1) systems carry a pressure stabilization
            # block C; without it Rp is singular on the spurious
            # checkerboard modes C exists to suppress, and the pinned LU
            # (constants only) amplifies them unboundedly
            if getattr(system, "C", None) is not None:
                Rp = Rp + system.C
            Rp = apply_pin(Rp.tocsr())
            self.Rp_solver = CoarseSolver.factor(
                jnp.asarray(Rp.toarray(), dtype), singular=singular
            )
        else:
            self.Rp_solver = None
        Fp_d = self.Fp
        Mp_s, Kp_s, Rp_s = self.Mp_solver, self.Kp_solver, self.Rp_solver

        @jax.jit
        def apply(x):
            y = Kp_s.solve(matmul.spmv(Fp_d, Mp_s.solve(x)))
            if Rp_s is not None:
                y = y + Rp_s.solve(x)
            return y

        self._apply = apply

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._apply(x)
