"""Shape-bucketed fitness: padding invariants + vmap-correct solver.

Grids padded to a shape bucket (identity rows) must produce the same
learned-AMG *semantics* as unpadded runs: exactly k_real centers on real
nodes, pad aggregates disconnected, solves unaffected by the pad block.
Bitwise equality is unattainable — InstanceNorm(eps=1e-5) on near-constant
features amplifies summation-order rounding by ~(var+eps)^{-3/2}, so padded
and unpadded programs diverge numerically (measured: ~5% on fitness); the
tests below check structure exactly and values loosely.
"""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.mg.cycle import twolevel_solve
from mlamg_tpu.mg.interp import sa_interpolation_dense
from mlamg_tpu.train import (
    GridBundle,
    SolveOptions,
    make_buckets,
    make_population_fitness,
    make_population_fitness_bucketed,
    measured_conv,
)
from mlamg_tpu.ga import flatten_params, init_population


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I)).tocsr()


class TestVmapFreeze:
    def test_batched_solve_matches_individual(self, rng):
        # two systems with very different convergence speeds: under vmap the
        # loop runs until both converge; the faster one's (iters, conv)
        # must be frozen, not overwritten by extra sweeps
        nx = 12
        A = poisson2d(nx)
        n = A.shape[0]
        agg = (np.arange(n) // nx // 2) * (nx // 2) + (np.arange(n) % nx) // 2
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        P_good = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65)
        P_bad = sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.05)
        x0 = rng.randn(n)
        x0 /= np.linalg.norm(x0)
        b = jnp.zeros(n)

        def solve(P):
            x, conv, err, it = twolevel_solve(
                Ac, P, b, jnp.asarray(x0), res_tol=1e-8, max_iter=400
            )
            return conv, it

        conv_g, it_g = solve(P_good)
        conv_b, it_b = solve(P_bad)
        assert int(it_g) < int(it_b)

        convs, its = jax.vmap(solve)(jnp.stack([P_good, P_bad]))
        np.testing.assert_allclose(
            np.asarray(convs), [float(conv_g), float(conv_b)], rtol=1e-12
        )
        np.testing.assert_array_equal(np.asarray(its), [int(it_g), int(it_b)])


class TestBuckets:
    def _grids(self, rng, dofs=(80, 150, 150, 300)):
        return [
            Grid.random_2d_unstructured(d, seed=rng.randint(1 << 31))
            for d in dofs
        ]

    def test_bucket_invariants(self, rng):
        grids = self._grids(rng)
        bundles, buckets = make_buckets(grids, 0.1, jnp.float32, step=64)
        all_idx = np.concatenate([b.idx for b in buckets])
        assert sorted(all_idx.tolist()) == list(range(len(grids)))
        for b in buckets:
            nb = b.A.shape[0]
            assert nb % 64 == 0
            B = len(b.idx)
            assert b.A.data.shape[0] == B
            assert b.x0.shape == (B, nb)
            for j, i in enumerate(b.idx):
                n = grids[i].A.shape[0]
                assert int(b.n_real[j]) == n
                assert 0 <= b.k - int(b.k_real[j]) <= nb - n

    def test_padded_model_structure(self, rng):
        g = Grid.random_2d_unstructured(150, seed=3)
        A = sp.csr_matrix(g.A)
        n = A.shape[0]
        nb = 192
        k_real = int(np.ceil(0.1 * n))
        k_b = int(np.ceil(0.1 * nb))
        Ap = sp.block_diag([A, sp.eye(nb - n, format="csr")], format="csr")
        Apc = CSR.from_scipy(Ap, dtype=jnp.float32)
        Ac = CSR.from_scipy(A, dtype=jnp.float32)
        net = FullAggNet(dim=4, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), Ac, k_real)
        agg, P, C, centers, _ = net.apply(params, Apc, k_b, pad=(n, k_real))
        centers = np.sort(np.asarray(centers))
        # exactly k_real real centers; the rest pinned to designated pads
        assert (centers < n).sum() == k_real
        np.testing.assert_array_equal(
            centers[centers >= n], np.arange(n, n + (k_b - k_real))
        )
        # real nodes never join pad aggregates (the pad block is disconnected)
        agg = np.asarray(agg)
        centers_arr = np.asarray(net.apply(params, Apc, k_b, pad=(n, k_real))[3])
        real_center_cols = {j for j, c in enumerate(centers_arr) if c < n}
        for i in range(n):
            assert agg[i] in real_center_cols or agg[i] >= k_b
        # padded solve is finite and behaves like a two-level solve
        x0 = np.zeros(nb, np.float32)
        xr = rng.randn(n)
        x0[:n] = xr / np.linalg.norm(xr)
        conv = measured_conv(Apc, P, jnp.asarray(x0), SolveOptions())
        assert np.isfinite(float(conv)) and 0.0 < float(conv) <= 1.0

    def test_bucketed_fitness_close_to_plain(self, rng):
        grids = self._grids(rng)
        opts = SolveOptions()
        bundles, buckets = make_buckets(grids, 0.1, jnp.float32, step=64)
        for b in bundles:
            b.ref_conv = 0.9
        net = FullAggNet(dim=4, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), bundles[0].A, bundles[0].k)
        vec, unravel, fold_ids, _ = flatten_params(params)
        pop = init_population(jax.random.PRNGKey(1), vec, 4, perturb=0.3)
        fp = np.asarray(make_population_fitness(net, unravel, bundles, opts)(pop, 0))
        fb = np.asarray(
            make_population_fitness_bucketed(net, unravel, bundles, buckets, opts)(
                pop, 0
            )
        )
        assert np.all(np.isfinite(fb))
        # loose: the chaotic InstanceNorm chain bounds how close runs can be
        assert np.abs(fp - fb).max() / np.abs(fp).max() < 0.25
