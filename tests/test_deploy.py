"""Deployment-layer tests: Stokes/Oseen generator, preconditioners,
Schur fieldsplit solver."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from mlamg_tpu.data.stokes import lid_driven_cavity
from mlamg_tpu.deploy import (
    Options,
    LearnedAMGPreconditioner,
    SAPreconditioner,
    PCDRPreconditioner,
    SchurFieldsplitSolver,
)
from mlamg_tpu.ops import CSR
from mlamg_tpu.mg import pcg


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


class TestStokesGenerator:
    def test_shapes_and_structure(self):
        s = lid_driven_cavity(n=8, Re=50.0)
        assert s.F.shape == (s.n_u, s.n_u)
        assert s.B.shape == (s.n_p, s.n_u)
        K = s.saddle_matrix()
        assert K.shape == (s.n_u + s.n_p, s.n_u + s.n_p)
        # divergence operator maps constant velocity into zero interior sums
        # (each interior cell gets +1/h and -1/h contributions)
        u_const = np.ones(s.n_u)
        div = s.B @ u_const
        # interior cells cancel exactly
        inner = div[np.abs(div) < 1e-12]
        assert len(inner) > 0

    def test_stokes_F_spd(self):
        s = lid_driven_cavity(n=8, Re=1.0, wind=(0.0, 0.0))
        F = s.F.toarray()
        np.testing.assert_allclose(F, F.T, atol=1e-12)
        assert np.linalg.eigvalsh(F).min() > 0

    def test_saddle_solvable(self):
        # pin one pressure dof to remove the nullspace; scipy must solve it
        s = lid_driven_cavity(n=8, Re=10.0)
        K = s.saddle_matrix().tolil()
        K[s.n_u, :] = 0.0
        K[s.n_u, s.n_u] = 1.0
        rhs = s.rhs()
        rhs[s.n_u] = 0.0
        x = spla.spsolve(K.tocsr(), rhs)
        assert np.isfinite(x).all()
        # lid drives a nonzero flow
        assert np.abs(x[: s.n_u]).max() > 1e-3


class TestPreconditioners:
    def test_learned_amg_fallback_accelerates_cg(self, rng):
        A = poisson2d(12)
        M = LearnedAMGPreconditioner(
            A, Options({"mlamg_amg_rtol": 0.0, "mlamg_max_iter": 2,
                        "mlamg_greedy_theta": 0.56}),
            dtype=jnp.float64,
        )
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        b = jnp.asarray(rng.randn(A.shape[0]))
        _, _, it_plain = pcg(Ac, b, tol=1e-8)
        _, _, it_prec = pcg(Ac, b, M=M, tol=1e-8)
        assert int(it_prec) < int(it_plain)

    def test_sa_preconditioner_accelerates_cg(self, rng):
        A = poisson2d(16)
        M = SAPreconditioner(A, Options({"pyamg_alpha": 0.15}), dtype=jnp.float64)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        b = jnp.asarray(rng.randn(A.shape[0]))
        _, _, it_plain = pcg(Ac, b, tol=1e-8)
        _, _, it_prec = pcg(Ac, b, M=M, tol=1e-8)
        assert int(it_prec) < int(it_plain)

    def test_pcdr_apply_finite(self, rng):
        s = lid_driven_cavity(n=8, Re=50.0, dt=0.1)
        pc = PCDRPreconditioner(s, dtype=jnp.float64)
        y = pc(jnp.asarray(rng.randn(s.n_p)))
        assert np.isfinite(np.asarray(y)).all()


class TestFieldsplit:
    def _solve(self, s, schur_pc, tol=1e-8):
        solver = SchurFieldsplitSolver(s, schur_pc, dtype=jnp.float64)
        x, hist, iters = solver.solve(tol=tol)
        r = s.saddle_matrix() @ np.asarray(x) - s.rhs()
        # project out the pressure-nullspace component of the residual
        return np.asarray(x), np.linalg.norm(r), int(iters)

    def test_stokes_with_pcd(self):
        s = lid_driven_cavity(n=8, Re=10.0, dt=0.05)
        pc = PCDRPreconditioner(s, dtype=jnp.float64)
        x, rnorm, iters = self._solve(s, pc)
        b_norm = np.linalg.norm(s.rhs())
        assert rnorm < 1e-5 * max(b_norm, 1.0), (rnorm, b_norm)
        # velocities match a pinned-pressure direct solve
        K = s.saddle_matrix().tolil()
        K[s.n_u, :] = 0.0
        K[s.n_u, s.n_u] = 1.0
        rhs = s.rhs(); rhs[s.n_u] = 0.0
        ref = spla.spsolve(K.tocsr(), rhs)
        np.testing.assert_allclose(x[: s.n_u], ref[: s.n_u], atol=1e-5)

    def test_oseen_with_pcd(self):
        s = lid_driven_cavity(n=8, Re=100.0, dt=0.1, wind=(1.0, 0.3))
        pc = PCDRPreconditioner(s, dtype=jnp.float64)
        x, rnorm, iters = self._solve(s, pc)
        assert rnorm < 1e-5 * max(np.linalg.norm(s.rhs()), 1.0)
