"""GA directly over the aggregate assignment (role of
utils/optimize_grid_param.py): the chromosome is the per-node aggregate id
itself; mutation moves nodes to a *graph-adjacent* aggregate, crossover
blends assignments region-wise — no neural network in the loop.

    python -m mlamg_tpu.cli.optimize_grid_param --n 10 --alpha 0.15 --generations 30
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.data import Grid
from mlamg_tpu.graph import lloyd_aggregation, strength_measure
from mlamg_tpu.mg import sa_interpolation_dense
from mlamg_tpu.train import GridBundle, SolveOptions, measured_conv
from mlamg_tpu.ga import ParallelGA, GAConfig


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--alpha", type=float, default=0.15)
    p.add_argument("--generations", type=int, default=30)
    p.add_argument("--population", type=int, default=16)
    p.add_argument("--epsilon", type=float, default=1.0)
    p.add_argument("--theta", type=float, default=0.0)
    args = p.parse_args(argv)

    g = Grid.structured_2d_poisson_dirichlet(args.n, args.n, args.epsilon, args.theta)
    bundle = GridBundle.from_grid(g, args.alpha)
    A, k, n = bundle.A, bundle.k, g.n
    opts = SolveOptions(max_iter=80)
    A_sp = g.A.tocsr()

    # seed population from Lloyd with different keys
    C = strength_measure(A, "abs")
    seeds = []
    for i in range(args.population):
        agg_id, _, _ = lloyd_aggregation(C, ratio=args.alpha, key=jax.random.PRNGKey(i))
        seeds.append(np.asarray(agg_id, dtype=np.float64))
    pop0 = jnp.asarray(np.stack(seeds))

    conv_of = jax.jit(
        jax.vmap(
            lambda assign: measured_conv(
                A,
                sa_interpolation_dense(A, assign.astype(jnp.int32), k),
                bundle.x0,
                opts,
            )
        )
    )

    def fitness(pop, gen):
        return 1.0 / jnp.maximum(conv_of(pop), 1e-3)

    rng = np.random.RandomState(0)

    class AssignmentGA(ParallelGA):
        """Graph-aware operators on integer assignment chromosomes
        (reference optimize_grid_param.py:166-240)."""

        def _mutation(self):
            new = np.where(~self.computed)[0]
            if len(new) == 0:
                return
            pop = np.asarray(self.population)
            for i in new:
                assign = pop[i].astype(np.int64)
                n_moves = rng.randint(1, max(2, n // 10))
                for _ in range(n_moves):
                    v = rng.randint(n)
                    nbrs = A_sp.indices[A_sp.indptr[v] : A_sp.indptr[v + 1]]
                    nbrs = nbrs[nbrs != v]
                    if len(nbrs):
                        assign[v] = assign[rng.choice(nbrs)]
                pop[i] = assign
            self.population = jnp.asarray(pop)
            self.computed[new] = False

    ga = AssignmentGA(
        pop0, fitness,
        GAConfig(crossover_probability=0.0, mutation_probability=1.0,
                 steady_state_top_use=0.5, steady_state_bottom_discard=0.5),
    )
    lloyd_conv = 1.0 / ga.best_solution()[1]
    print(f"best Lloyd seed conv: {lloyd_conv:.4f}")
    for _ in range(args.generations):
        ga.iteration()
        best, fit, _ = ga.best_solution()
        print(f"gen {ga.num_generation}: conv {1.0 / fit:.4f}")
    print(f"improvement over Lloyd: {lloyd_conv - 1.0 / ga.best_solution()[1]:.4f}")


if __name__ == "__main__":
    main()
