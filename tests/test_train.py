"""Training-layer tests: bundles, reference baselines, population fitness."""

import numpy as np

import jax
import jax.numpy as jnp

from mlamg_tpu.data import Grid
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population
from mlamg_tpu.train import (
    GridBundle,
    SolveOptions,
    make_population_fitness,
    lloyd_reference_conv,
    random_reference_conv,
    evaluate_model_on_bundles,
)


def bundles_2d(n_grids=2, side=8, alpha=0.2):
    out = []
    for i in range(n_grids):
        g = Grid.structured_2d_poisson_dirichlet(side, side, epsilon=0.5 + 0.1 * i)
        out.append(GridBundle.from_grid(g, alpha, dtype=jnp.float64))
    return out


class TestReferenceBaselines:
    def test_lloyd_reference_reasonable(self):
        b = bundles_2d(1)[0]
        opts = SolveOptions(res_tol=1e-8, max_iter=200)
        conv = lloyd_reference_conv(b, "abs", opts)
        assert 0.0 < conv < 1.0

    def test_random_reference_reasonable(self):
        b = bundles_2d(1)[0]
        conv = random_reference_conv(b, opts=SolveOptions(res_tol=1e-8, max_iter=200))
        assert 0.0 < conv <= 1.0

    def test_deterministic(self):
        b = bundles_2d(1)[0]
        opts = SolveOptions(res_tol=1e-8, max_iter=200)
        assert lloyd_reference_conv(b, "abs", opts) == lloyd_reference_conv(b, "abs", opts)


class TestPopulationFitness:
    def test_fitness_shape_and_relative_measure(self):
        bl = bundles_2d(2)
        opts = SolveOptions(res_tol=1e-6, max_iter=60)
        for b in bl:
            b.ref_conv = lloyd_reference_conv(b, "abs", opts)
        net = FullAggNet(dim=2, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), bl[0].A, bl[0].k)
        vec, unravel, fold_ids, _ = flatten_params(params)
        fit = make_population_fitness(net, unravel, bl, opts)
        pop = init_population(jax.random.PRNGKey(1), vec, 3, perturb=0.1)
        vals = np.asarray(fit(pop, 0))
        assert vals.shape == (3,)
        assert np.isfinite(vals).all() and (vals > 0).all()

    def test_partial_population_padding(self):
        # odd-sized subsets must evaluate identically to full-population runs
        bl = bundles_2d(1)
        opts = SolveOptions(res_tol=1e-6, max_iter=40)
        bl[0].ref_conv = 0.5
        net = FullAggNet(dim=2, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), bl[0].A, bl[0].k)
        vec, unravel, fold_ids, _ = flatten_params(params)
        fit = make_population_fitness(net, unravel, bl, opts)
        pop = init_population(jax.random.PRNGKey(1), vec, 5, perturb=0.1)
        full = np.asarray(fit(pop, 0))
        sub = np.asarray(fit(pop[:3], 0))
        np.testing.assert_allclose(sub, full[:3], rtol=1e-6)

    def test_ga_learns_on_tiny_problem(self):
        # end-to-end: the GA must improve fitness within a few generations on
        # an easy grid (guards the full train loop incl. the mutation path)
        bl = bundles_2d(1, side=6, alpha=0.25)
        opts = SolveOptions(res_tol=1e-6, max_iter=60)
        bl[0].ref_conv = max(lloyd_reference_conv(bl[0], "abs", opts), 1e-6)
        net = FullAggNet(dim=2, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), bl[0].A, bl[0].k)
        vec, unravel, fold_ids, _ = flatten_params(params)
        fit = make_population_fitness(net, unravel, bl, opts)
        pop0 = init_population(jax.random.PRNGKey(2), vec, 8, perturb=0.2)
        ga = ParallelGA(
            pop0, fit,
            GAConfig(crossover_probability=0.0, mutation_probability=0.5,
                     mutation_min_perturb=-0.2, mutation_max_perturb=0.2,
                     steady_state_top_use=0.5, steady_state_bottom_discard=0.5),
            fold_ids=fold_ids,
        )
        f0 = ga.best_solution()[1]
        for _ in range(8):
            ga.iteration()
        f1 = ga.best_solution()[1]
        assert f1 >= f0
        # population must actually move (regression for the no-op-GA bug)
        assert not np.allclose(np.asarray(ga.population), np.asarray(pop0))


class TestEvaluate:
    def test_evaluate_model_on_bundles(self):
        bl = bundles_2d(2)
        net = FullAggNet(dim=2, num_conv=2, iterations=1)
        params = net.init(jax.random.PRNGKey(0), bl[0].A, bl[0].k)
        convs = evaluate_model_on_bundles(net, params, bl, SolveOptions(max_iter=40))
        assert convs.shape == (2,)
        assert np.isfinite(convs).all()
