"""Data-layer tests: FEM assembly vs analytic stencils, generators, .grid IO."""

import os

import numpy as np
import scipy.sparse as sp

from mlamg_tpu.data import Grid, fem, rotation_matrix_3d


class TestFEM:
    def test_regular_mesh_counts(self):
        v, e = fem.regular_triangle_mesh(4, 5)
        assert v.shape == (20, 2)
        assert e.shape == (2 * 3 * 4, 3)

    def test_isotropic_matches_5point_stencil(self):
        # P1 FEM on a right-triangulated uniform grid gives exactly the
        # 5-point Laplacian stencil (the diagonal terms cancel).
        g = Grid.structured_2d_poisson_dirichlet(5, 5)
        n = 5
        h = 1.0 / 6.0
        T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
        I = sp.eye(n)
        ref = (sp.kron(I, T) + sp.kron(T, I)).toarray()
        np.testing.assert_allclose(g.A.toarray(), ref, atol=1e-10)

    def test_patch_test_linear_exact(self):
        # FEM must reproduce u(x,y)=x exactly: A_int @ u_int = -A_ib @ u_bnd
        v, e = fem.regular_triangle_mesh(7, 7)
        A = fem.gradgradform(v, e)
        u = v[:, 0]
        r = A @ u
        # residual must vanish at interior nodes (row sums against linear u)
        interior = np.ones(len(v), bool)
        interior[fem.boundary_vertices_structured(v)] = False
        np.testing.assert_allclose(r[interior], 0.0, atol=1e-12)

    def test_anisotropic_symmetry(self):
        g = Grid.structured_2d_poisson_dirichlet(6, 6, epsilon=0.01, theta=0.3)
        A = g.A
        np.testing.assert_allclose((A - A.T).toarray(), 0.0, atol=1e-12)
        # SPD
        w = np.linalg.eigvalsh(A.toarray())
        assert w.min() > 0

    def test_anisotropic_axis_coupling(self):
        # epsilon << 1, theta=0: coupling in y (epsilon direction) is weak
        g = Grid.structured_2d_poisson_dirichlet(8, 8, epsilon=1e-3, theta=0.0)
        A = g.A.tocsr()
        x = g.x
        # find an interior node and its +x and +y neighbours by coordinates
        i = np.argmin(np.abs(x - 0.5).sum(1))
        hx = np.unique(np.round(np.diff(np.unique(x[:, 0])), 12))[0]
        j_x = np.where((np.abs(x[:, 0] - x[i, 0] - hx) < 1e-9) & (np.abs(x[:, 1] - x[i, 1]) < 1e-9))[0][0]
        j_y = np.where((np.abs(x[:, 1] - x[i, 1] - hx) < 1e-9) & (np.abs(x[:, 0] - x[i, 0]) < 1e-9))[0][0]
        assert abs(A[i, j_x]) > 50 * abs(A[i, j_y])

    def test_jump_kappa(self):
        jumps = np.array([[0.25, 0.5, 1.0], [0.75, 0.5, 100.0]])
        g = Grid.structured_2d_poisson_dirichlet_jumps(9, 9, jumps)
        A = g.A
        # rows on the right half should have ~100x larger diagonal
        x = g.x
        left = np.where(x[:, 0] < 0.4)[0]
        right = np.where(x[:, 0] > 0.6)[0]
        d = A.diagonal()
        assert d[right].mean() > 20 * d[left].mean()


class TestGenerators:
    def test_1d_dirichlet(self):
        g = Grid.structured_1d_poisson_dirichlet(10)
        h = 1.0 / 11.0
        ref = (sp.eye(10) * 2 - sp.eye(10, k=1) - sp.eye(10, k=-1)) / h**2
        np.testing.assert_allclose(g.A.toarray(), ref.toarray(), atol=1e-9)

    def test_1d_neumann_nullspace(self):
        g = Grid.structured_1d_poisson_neumann(12)
        np.testing.assert_allclose(g.A @ np.ones(12), 0.0, atol=1e-9)

    def test_random_unstructured(self):
        g = Grid.random_2d_unstructured(120, seed=3)
        A = g.A
        assert A.shape[0] > 50
        np.testing.assert_allclose((A - A.T).toarray(), 0.0, atol=1e-12)
        w = np.linalg.eigvalsh(A.toarray())
        assert w.min() > -1e-10

    def test_3d_laplace_isotropic(self):
        g = Grid.structured_3d_laplace_dirichlet(5, 5, 5)
        n = 125
        A = g.A
        assert A.shape == (n, n)
        np.testing.assert_allclose((A - A.T).toarray(), 0.0, atol=1e-10)
        # 7-point stencil interior row: diag 6/h^2, six neighbours -1/h^2
        h = 1.0 / 6.0
        row = A[62].toarray().ravel()  # center node
        np.testing.assert_allclose(row[62], 6.0 / h**2, rtol=1e-12)
        assert (np.abs(row[row != 0][np.abs(row[row != 0]) < 5.0 / h**2]) > 0).all()

    def test_3d_anisotropic_rotated_spd(self):
        R = rotation_matrix_3d(0.3, 0.2, 0.1)
        g = Grid.structured_3d_laplace_dirichlet(4, 4, 4, epsilon=[1.0, 0.1, 0.01], R=R)
        A = g.A.toarray()
        np.testing.assert_allclose(A, A.T, atol=1e-10)
        w = np.linalg.eigvalsh(A)
        assert w.min() > 0


class TestGridIO:
    def test_roundtrip(self, tmp_path):
        g = Grid.structured_2d_poisson_dirichlet(6, 6, epsilon=0.5, theta=0.1)
        p = os.path.join(tmp_path, "test")
        g.save(p)
        g2 = Grid.load(p)
        assert (abs(g.A - g2.A)).max() < 1e-15
        np.testing.assert_allclose(g.x, g2.x)
        assert g2.extra["epsilon"] == 0.5

    def test_reference_format_compat(self, tmp_path):
        # a .grid file written the way the reference writes it must load
        import bz2, pickle

        A = sp.random(20, 20, density=0.2, format="csr", random_state=0)
        x = np.random.rand(20, 2)
        fname = os.path.join(tmp_path, "ref.grid")
        with bz2.open(fname, "wb") as f:
            pickle.dump({"A": (A.data, A.indices, A.indptr), "x": x, "extra": {"k": 1}}, f)
        g = Grid.load(fname)
        assert (abs(g.A - A)).max() < 1e-15
        assert g.extra["k"] == 1

    def test_load_dir(self, tmp_path):
        for i in range(3):
            Grid.structured_1d_poisson_dirichlet(8 + i).save(
                os.path.join(tmp_path, f"g{i}")
            )
        grids = Grid.load_dir(tmp_path)
        assert len(grids) == 3
