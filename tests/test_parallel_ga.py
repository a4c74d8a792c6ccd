"""GA + mesh-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population
from mlamg_tpu.parallel import make_mesh, shard_population_eval, PartitionedELL, pspmv, pspmv_halo
from mlamg_tpu.parallel.pspmv import partitioned_jacobi
from mlamg_tpu.optimize import SPSA, CuckooSearch


class TestCodec:
    def test_flatten_roundtrip(self, rng):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(4, name="A")(x)
                return nn.Dense(2, name="B")(x)

        m = M()
        params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
        vec, unravel, fold_ids, names = flatten_params(params)
        back = unravel(vec)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # two folds: params/A and params/B
        assert len(names) == 2
        assert fold_ids.shape == vec.shape
        assert set(np.asarray(fold_ids)) == {0, 1}

    def test_init_population(self):
        vec = jnp.arange(5.0)
        pop = init_population(jax.random.PRNGKey(0), vec, 4, perturb=0.5)
        assert pop.shape == (4, 5)
        np.testing.assert_allclose(np.asarray(pop[0]), np.arange(5.0))
        assert np.abs(np.asarray(pop[1:]) - np.arange(5.0)).max() <= 0.5


class TestGA:
    def test_fits_quadratic(self):
        # the reference's GA smoke test (demos/ga-test.py): maximize
        # fitness = 1/|f(x)| for f = sum (x - target)^2
        target = jnp.asarray([1.0, -2.0, 3.0])

        def fitness(pop, gen):
            err = jnp.sum((pop - target[None, :]) ** 2, axis=1)
            return 1.0 / (err + 1e-9)

        pop0 = init_population(jax.random.PRNGKey(1), jnp.zeros(3), 32, perturb=2.0)
        ga = ParallelGA(
            pop0,
            fitness,
            GAConfig(
                mutation_probability=0.6,
                mutation_min_perturb=-0.3,
                mutation_max_perturb=0.3,
                steady_state_top_use=0.5,
                steady_state_bottom_discard=0.5,
            ),
        )
        fits = []
        for _ in range(60):
            ga.iteration()
            fits.append(ga.best_solution()[1])
        best, fit, _ = ga.best_solution()
        assert fit > 10.0, f"fitness {fit}, best {best}"
        # monotone non-decreasing best fitness (elitism)
        assert all(b >= a - 1e-9 for a, b in zip(fits, fits[1:]))

    def test_adaptive_sigma_refines_past_fixed_scale(self):
        # A fixed +-1.0 full-vector perturbation stalls near the optimum of
        # a smooth quadratic (every move overshoots); the 1/5-success rule
        # shrinks the scale and keeps refining.
        target = jnp.asarray(np.linspace(-1, 1, 20))

        def fitness(pop, gen):
            err = jnp.sum((pop - target[None, :]) ** 2, axis=1)
            return 1.0 / (err + 1e-9)

        pop0 = init_population(jax.random.PRNGKey(3), jnp.zeros(20), 16, perturb=1.0)

        def run(adaptive):
            ga = ParallelGA(
                pop0,
                fitness,
                GAConfig(
                    crossover_probability=0.0,
                    mutation_probability=1.0,
                    mutation_min_perturb=-1.0,
                    mutation_max_perturb=1.0,
                    steady_state_top_use=0.5,
                    steady_state_bottom_discard=0.5,
                    adaptive_sigma=adaptive,
                    mutation_sparsity=0.3 if adaptive else None,
                ),
                key=7,
            )
            for _ in range(80):
                ga.iteration()
            return ga.best_solution()[1], ga

        fit_fixed, _ = run(False)
        fit_adapt, ga = run(True)
        assert fit_adapt > 5 * fit_fixed, (fit_fixed, fit_adapt)
        assert ga.sigma < ga.sigma0  # scale actually annealed

    def test_mutation_only_improves(self):
        # regression: with crossover_probability = 0 the steady-state
        # offspring are parent copies and MUST still be mutated (a bug once
        # marked them computed, silently disabling mutation -> no-op GA)
        target = jnp.asarray([1.5, -0.5])

        def fitness(pop, gen):
            return 1.0 / (jnp.sum((pop - target) ** 2, axis=1) + 1e-6)

        pop0 = init_population(jax.random.PRNGKey(3), jnp.zeros(2), 16, perturb=0.5)
        ga = ParallelGA(
            pop0,
            fitness,
            GAConfig(crossover_probability=0.0, mutation_probability=0.8,
                     mutation_min_perturb=-0.2, mutation_max_perturb=0.2,
                     steady_state_top_use=0.5, steady_state_bottom_discard=0.5),
        )
        f0 = ga.best_solution()[1]
        for _ in range(30):
            ga.iteration()
        assert ga.best_solution()[1] > f0 * 1.5

    def test_selection_variants(self):
        target = jnp.asarray([2.0, 2.0])

        def fitness(pop, gen):
            return 1.0 / (jnp.sum((pop - target) ** 2, axis=1) + 1e-6)

        for sel in ["roulette", "greedy"]:
            pop0 = init_population(jax.random.PRNGKey(2), jnp.zeros(2), 16, perturb=2.0)
            ga = ParallelGA(
                pop0,
                fitness,
                GAConfig(selection=sel, mutation_probability=0.8,
                         mutation_min_perturb=-0.2, mutation_max_perturb=0.2),
            )
            f0 = ga.best_solution()[1]
            for _ in range(25):
                ga.iteration()
            assert ga.best_solution()[1] >= f0

    def test_fold_crossover_preserves_folds(self):
        # with crossover probability 1 and no mutation, every offspring's
        # fold must come intact from one of its two parents
        fold_ids = jnp.asarray([0, 0, 1, 1, 2], dtype=jnp.int32)
        pop0 = jnp.stack([jnp.full(5, float(i)) for i in range(8)])

        def fitness(pop, gen):
            return jnp.sum(pop, axis=1)

        ga = ParallelGA(
            pop0,
            fitness,
            GAConfig(crossover_probability=1.0, mutation_probability=0.0,
                     steady_state_bottom_discard=0.5, steady_state_top_use=0.5),
            fold_ids=fold_ids,
        )
        ga.iteration()
        pop = np.asarray(ga.population)
        for row in pop:
            for f in range(3):
                vals = row[np.asarray(fold_ids) == f]
                assert len(set(vals.tolist())) == 1  # fold intact

    def test_restart(self):
        def fitness(pop, gen):
            return -jnp.sum(pop**2, axis=1)

        pop0 = init_population(jax.random.PRNGKey(0), jnp.ones(4), 6, perturb=1.0)
        ga = ParallelGA(pop0, fitness, GAConfig(restart_every=2, mutation_probability=0.5))
        for _ in range(5):
            ga.iteration()
        assert np.isfinite(ga.best_solution()[1])

    def test_stochastic_iteration(self):
        def fitness(pop, gen):
            noise = 0.01 * gen
            return 1.0 / (jnp.sum(pop**2, axis=1) + 1e-6) + noise

        pop0 = init_population(jax.random.PRNGKey(0), jnp.ones(3), 8, perturb=1.0)
        ga = ParallelGA(pop0, fitness)
        for _ in range(5):
            ga.stochastic_iteration()
        assert np.isfinite(ga.best_solution()[1])


class TestMeshParallel:
    def test_sharded_population_eval_matches_local(self):
        mesh = make_mesh(pop=8, row=1)

        def fitness_vmapped(pop):
            return jnp.sum(jnp.sin(pop) ** 2, axis=1)

        ev = shard_population_eval(fitness_vmapped, mesh)
        pop = jnp.asarray(np.random.RandomState(0).randn(16, 10))
        got = np.asarray(ev(pop))
        ref = np.asarray(fitness_vmapped(pop))
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_sharded_eval_non_divisible(self):
        mesh = make_mesh(pop=8, row=1)
        ev = shard_population_eval(lambda p: jnp.sum(p, axis=1), mesh)
        pop = jnp.asarray(np.random.RandomState(0).randn(13, 4))
        np.testing.assert_allclose(np.asarray(ev(pop)), np.asarray(pop.sum(1)), rtol=1e-6)

    def test_ga_on_mesh(self):
        mesh = make_mesh(pop=8, row=1)
        target = jnp.asarray([1.0, 2.0, 3.0, 4.0])

        def fitness_vmapped(pop):
            return 1.0 / (jnp.sum((pop - target) ** 2, axis=1) + 1e-6)

        ev = shard_population_eval(fitness_vmapped, mesh)
        pop0 = init_population(jax.random.PRNGKey(0), jnp.zeros(4), 24, perturb=2.0)
        ga = ParallelGA(pop0, lambda pop, gen: ev(pop),
                        GAConfig(mutation_probability=0.7,
                                 mutation_min_perturb=-0.3, mutation_max_perturb=0.3,
                                 steady_state_top_use=0.5, steady_state_bottom_discard=0.5))
        f0 = ga.best_solution()[1]
        for _ in range(30):
            ga.iteration()
        assert ga.best_solution()[1] > f0


class TestPartitionedSpMV:
    def poisson1d(self, n):
        return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()

    def test_pspmv_allgather(self, rng):
        mesh = make_mesh(pop=1, row=8)
        A = sp.random(64, 64, density=0.2, format="csr", random_state=rng)
        Ap = PartitionedELL.from_scipy(A, 8, dtype=jnp.float64)
        x = rng.randn(64)
        xs = Ap.shard_x(jnp.asarray(x), mesh)
        y = pspmv(Ap, xs, mesh)
        np.testing.assert_allclose(np.asarray(y).ravel()[:64], A @ x, atol=1e-10)

    def test_pspmv_halo_banded(self, rng):
        mesh = make_mesh(pop=1, row=8)
        n = 64
        A = self.poisson1d(n)
        Ap = PartitionedELL.from_scipy(A, 8, halo=2, dtype=jnp.float64)
        x = rng.randn(n)
        xs = Ap.shard_x(jnp.asarray(x), mesh)
        y = pspmv_halo(Ap, xs, mesh)
        np.testing.assert_allclose(np.asarray(y).ravel()[:n], A @ x, atol=1e-10)

    def test_halo_bandwidth_check(self, rng):
        A = sp.random(32, 32, density=0.5, format="csr", random_state=rng)
        try:
            PartitionedELL.from_scipy(A, 8, halo=1)
            assert False, "expected bandwidth error"
        except ValueError as e:
            assert "bandwidth" in str(e)

    def test_partitioned_jacobi_matches_serial(self, rng):
        from mlamg_tpu.ops import CSR
        from mlamg_tpu.mg import jacobi

        mesh = make_mesh(pop=1, row=8)
        n = 64
        A = self.poisson1d(n)
        Ap = PartitionedELL.from_scipy(A, 8, halo=2, dtype=jnp.float64)
        dinv = Ap.shard_x(jnp.asarray(1.0 / A.diagonal()), mesh)
        b = rng.randn(n)
        bs = Ap.shard_x(jnp.asarray(b), mesh)
        xs = Ap.shard_x(jnp.zeros(n), mesh)
        ys = partitioned_jacobi(Ap, dinv, bs, xs, mesh, nu=3)
        ref = jacobi(CSR.from_scipy(A, dtype=jnp.float64), jnp.asarray(b), jnp.zeros(n), nu=3)
        np.testing.assert_allclose(np.asarray(ys).ravel()[:n], np.asarray(ref), atol=1e-10)


class TestPartitionedBF:
    def test_matches_serial_bf(self, rng):
        from mlamg_tpu.ops import CSR
        from mlamg_tpu.graph import bellman_ford
        from mlamg_tpu.parallel import pbf

        mesh = make_mesh(pop=1, row=8)
        n = 64
        # banded symmetric positive-weight graph (pbf assumes symmetry)
        w = rng.rand(n - 1) + 0.1
        A = sp.diags([w, w], [-1, 1]).tocsr()
        Ap = PartitionedELL.from_scipy(A, 8, halo=1, dtype=jnp.float64)
        centers = np.array([5, 40], np.int32)
        cmask = np.zeros(n, bool)
        cmask[centers] = True
        cm_sharded = jnp.asarray(cmask).reshape(8, 8)

        dist, near = pbf(Ap, cm_sharded, mesh)
        dist = np.asarray(dist).ravel()[:n]
        near = np.asarray(near).ravel()[:n]

        d_ref, n_ref = bellman_ford(
            CSR.from_scipy(A, dtype=jnp.float64), jnp.asarray(centers)
        )
        np.testing.assert_allclose(dist, np.asarray(d_ref), atol=1e-10)
        np.testing.assert_array_equal(near, np.asarray(n_ref))

    def test_matches_serial_bf_directed(self, rng):
        # learned CNet weights are directed: C[i,j] != C[j,i].  pbf must
        # agree with the serial kernel on an asymmetric banded graph when
        # partitioned through pbf_partition (which stores C^T).
        from mlamg_tpu.ops import CSR
        from mlamg_tpu.graph import bellman_ford
        from mlamg_tpu.parallel import pbf, pbf_partition

        mesh = make_mesh(pop=1, row=8)
        n = 64
        lo = rng.rand(n - 1) + 0.1
        up = rng.rand(n - 1) + 0.1  # different weights per direction
        C = sp.diags([lo, up], [-1, 1]).tocsr()
        Cp = pbf_partition(C, 8, halo=1, dtype=jnp.float64)
        centers = np.array([3, 47], np.int32)
        cmask = np.zeros(n, bool)
        cmask[centers] = True
        cm_sharded = jnp.asarray(cmask).reshape(8, 8)

        dist, near = pbf(Cp, cm_sharded, mesh)
        dist = np.asarray(dist).ravel()[:n]
        near = np.asarray(near).ravel()[:n]

        d_ref, n_ref = bellman_ford(
            CSR.from_scipy(C, dtype=jnp.float64), jnp.asarray(centers)
        )
        np.testing.assert_allclose(dist, np.asarray(d_ref), atol=1e-10)
        np.testing.assert_array_equal(near, np.asarray(n_ref))


class TestOptimizers:
    def test_spsa_minimizes(self):
        f = lambda x: jnp.sum((x - 2.0) ** 2)
        opt = SPSA(f, c=1e-3, lr=0.1)
        x = jnp.zeros(4)
        key = jax.random.PRNGKey(0)
        for i in range(200):
            key, sub = jax.random.split(key)
            x = opt.step(x, sub)
        assert float(f(x)) < 0.5

    def test_cuckoo_minimizes(self):
        f = lambda x: jnp.sum((x - 1.0) ** 2)
        pop = jnp.asarray(np.random.RandomState(0).randn(20, 3))
        cs = CuckooSearch(f, pop)
        f0 = cs.best()[1]
        for _ in range(50):
            cs.step()
        assert cs.best()[1] <= f0
