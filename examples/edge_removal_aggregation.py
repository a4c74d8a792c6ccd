"""Aggregation by scored edge union (role of demos/train_edge_removal.py):
a GA optimizes per-edge scores; aggregates form by union-find over the
highest-scored edges; fitness is the measured two-level convergence factor.

    python examples/edge_removal_aggregation.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.graph.disjoint_sets import DisjointSets
from mlamg_tpu.mg import sa_interpolation_dense
from mlamg_tpu.train import GridBundle, SolveOptions, measured_conv
from mlamg_tpu.ga import ParallelGA, GAConfig, init_population


def main():
    g = Grid.structured_2d_poisson_dirichlet(8, 8)
    A = g.A
    n = g.n
    bundle = GridBundle.from_grid(g, alpha=0.2)
    opts = SolveOptions(max_iter=60)

    coo = A.tocoo()
    upper = coo.row < coo.col
    edges = np.column_stack([coo.row[upper], coo.col[upper]])
    E = len(edges)
    target_aggs = bundle.k

    def aggregate_from_scores(scores):
        order = np.argsort(-scores)
        ds = DisjointSets(n)
        for e in order:
            if ds.num_sets <= target_aggs:
                break
            ds.union(int(edges[e, 0]), int(edges[e, 1]))
        labels = ds.labels()
        _, agg_id = np.unique(labels, return_inverse=True)
        return agg_id, ds.num_sets

    def fitness(pop, gen):
        out = np.zeros(pop.shape[0])
        for i, scores in enumerate(np.asarray(pop)):
            agg_id, k = aggregate_from_scores(scores)
            P = sa_interpolation_dense(bundle.A, jnp.asarray(agg_id), k)
            conv = float(measured_conv(bundle.A, P, bundle.x0, opts))
            out[i] = 1.0 / max(conv, 1e-3)
        return jnp.asarray(out)

    pop0 = init_population(jax.random.PRNGKey(0), jnp.zeros(E), 12, perturb=1.0)
    ga = ParallelGA(
        pop0, fitness,
        GAConfig(mutation_probability=0.3, mutation_min_perturb=-0.5,
                 mutation_max_perturb=0.5, steady_state_top_use=0.5,
                 steady_state_bottom_discard=0.5),
    )
    for gen in range(10):
        ga.iteration()
        best, fit, _ = ga.best_solution()
        print(f"gen {ga.num_generation}: best conv {1.0 / fit:.4f}")


if __name__ == "__main__":
    main()
