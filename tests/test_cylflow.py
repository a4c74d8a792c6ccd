"""Unstructured cylinder-channel Oseen deployment case
(role of the reference's demos/unsteady-cylflow.py + mesh/*.msh assets)."""

import numpy as np
import scipy.sparse.linalg as spla
import pytest

import jax.numpy as jnp

from mlamg_tpu.data.cylflow import (
    cylinder_channel_mesh,
    classify_boundary,
    cylinder_flow_system,
)
from mlamg_tpu.data.fem import (
    mass_form,
    convection_form,
    div_forms,
    bp_stabilization,
    regular_triangle_mesh,
)


class TestForms:
    def test_mass_total(self):
        # integral of 1 over the unit square = 1
        v, e = regular_triangle_mesh(9, 9)
        M = mass_form(v, e)
        one = np.ones(v.shape[0])
        assert abs(one @ (M @ one) - 1.0) < 1e-12

    def test_convection_skew_on_divfree_wind(self):
        # for a constant (divergence-free) wind and zero boundary terms the
        # convection form is skew-symmetric up to boundary contributions:
        # row sums vanish (C @ 1 = 0 since grad of constant = 0)
        v, e = regular_triangle_mesh(9, 9)
        C = convection_form(v, e, lambda x, y: np.column_stack(
            [np.ones_like(x), 0.5 * np.ones_like(y)]
        ))
        one = np.ones(v.shape[0])
        assert np.abs(C @ one).max() < 1e-12

    def test_divergence_of_linear_field(self):
        # u = (x, 0) has div u = 1: q^T (Bx @ x_coords) = integral of q
        v, e = regular_triangle_mesh(9, 9)
        Bx, By = div_forms(v, e)
        M = mass_form(v, e)
        one = np.ones(v.shape[0])
        got = Bx @ v[:, 0] + By @ np.zeros(v.shape[0])
        want = M @ one  # integral of each basis fn
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_bp_stab_psd_with_constant_nullspace(self):
        v, e = regular_triangle_mesh(7, 7)
        S = bp_stabilization(v, e).toarray()
        np.testing.assert_allclose(S, S.T, atol=1e-14)
        w = np.linalg.eigvalsh(S)
        assert w[0] > -1e-12
        assert abs(S @ np.ones(len(S))).max() < 1e-12


class TestCylinderMesh:
    def test_mesh_quality_and_hole(self):
        v, e = cylinder_channel_mesh(h=0.05)
        assert len(v) > 200
        # no vertex inside the cylinder
        d = np.hypot(v[:, 0] - 0.2, v[:, 1] - 0.2)
        assert d.min() > 0.05 * 0.999
        # all element areas positive and not degenerate
        p0, p1, p2 = v[e[:, 0]], v[e[:, 1]], v[e[:, 2]]
        area = 0.5 * np.abs(
            (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
            - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0])
        )
        assert area.min() > 0
        # total area = rectangle - disk (within mesh resolution)
        want = 2.2 * 0.41 - np.pi * 0.05**2
        assert abs(area.sum() - want) < 0.01

    def test_boundary_classification(self):
        v, _ = cylinder_channel_mesh(h=0.05)
        inflow, walls, cyl, outflow = classify_boundary(v)
        assert len(inflow) > 2 and len(outflow) > 2
        assert len(cyl) >= 16
        assert np.all(v[inflow, 0] == 0.0)
        assert np.all(v[outflow, 0] == 2.2)


class TestCylinderSystem:
    @pytest.fixture(scope="class")
    def system(self):
        return cylinder_flow_system(h=0.06, Re=50.0, dt=0.2)

    def test_direct_solve_physics(self, system):
        A = system.saddle_matrix().tocsc()
        x = spla.spsolve(A, system.rhs())
        r = np.linalg.norm(A @ x - system.rhs()) / np.linalg.norm(system.rhs())
        assert r < 1e-10
        # flow must accelerate past the obstruction: max speed > inflow max
        nf = len(system.free_velocity_nodes)
        ux = np.zeros(system.Ap.shape[0])
        ux[system.free_velocity_nodes] = x[:nf]
        assert ux.max() > 1.5

    def test_pcdr_fieldsplit_matches_direct(self, system):
        from mlamg_tpu.deploy import PCDRPreconditioner, SchurFieldsplitSolver

        x_true = spla.spsolve(system.saddle_matrix().tocsc(), system.rhs())
        pc = PCDRPreconditioner(system, dtype=jnp.float64)
        solver = SchurFieldsplitSolver(system, pc, dtype=jnp.float64)
        x, hist, iters = solver.solve(tol=1e-8)
        err = np.linalg.norm(np.asarray(x) - x_true) / np.linalg.norm(x_true)
        assert err < 1e-6
        # PCD on the pinned pressure space is h-robust: well under the
        # unpreconditioned count and under 100 for this size
        assert int(iters) < 100

    def test_stabilization_carried_by_matvec(self, system):
        from mlamg_tpu.deploy import SchurFieldsplitSolver

        solver = SchurFieldsplitSolver(system, lambda r: r, dtype=jnp.float64)
        rng = np.random.RandomState(0)
        x = rng.randn(system.n_u + system.n_p)
        got = np.asarray(solver.matvec(jnp.asarray(x)))
        want = system.saddle_matrix() @ x
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
