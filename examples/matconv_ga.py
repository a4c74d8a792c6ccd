"""Minimal A-polynomial graph net trained by GA (role of demos/matconv.py,
whose pure-numpy MatConv shows the model family reduces to polynomials of
the matrix — exactly our TAGConv).  A tiny TAGConv scores aggregate centers;
the GA optimizes its flattened weights against the measured conv factor.

    python examples/matconv_ga.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.data import Grid
from mlamg_tpu.models import graph_from_matrix_basic, TAGConv
from mlamg_tpu.graph.topk import topk_indices
from mlamg_tpu.graph.bellman_ford import bellman_ford, nearest_center_to_agg
from mlamg_tpu.mg import sa_interpolation_dense
from mlamg_tpu.train import GridBundle, SolveOptions, measured_conv
from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population


class MatConvNet(nn.Module):
    dim: int = 4
    K: int = 3

    @nn.compact
    def __call__(self, g):
        ew = g.edge_attr[:, 0]
        x = nn.relu(TAGConv(self.dim, K=self.K)(g, g.x, ew))
        x = TAGConv(1, K=self.K)(g, x, ew)
        return x[:, 0]


def main():
    g = Grid.structured_2d_poisson_dirichlet(9, 9)
    bundle = GridBundle.from_grid(g, alpha=0.15)
    A, k, n = bundle.A, bundle.k, g.n
    opts = SolveOptions(max_iter=60)
    gd = graph_from_matrix_basic(A)
    unit = A.with_data(jnp.where(A.mask, 1.0, 0.0))

    net = MatConvNet()
    params = net.init(jax.random.PRNGKey(0), gd)
    vec, unravel, fold_ids, _ = flatten_params(params)

    def conv_of(v):
        scores = net.apply(unravel(v), gd)
        centers = topk_indices(scores, k)
        _, nearest = bellman_ford(unit, centers)
        agg_id = nearest_center_to_agg(centers, nearest)
        P = sa_interpolation_dense(A, agg_id, k)
        return measured_conv(A, P, bundle.x0, opts)

    fitness = jax.jit(jax.vmap(lambda v: 1.0 / jnp.maximum(conv_of(v), 1e-3)))
    pop0 = init_population(jax.random.PRNGKey(1), vec, 16, perturb=0.5)
    ga = ParallelGA(pop0, lambda pop, gen: fitness(pop),
                    GAConfig(mutation_probability=0.8,
                             mutation_min_perturb=-0.3, mutation_max_perturb=0.3,
                             steady_state_top_use=0.5, steady_state_bottom_discard=0.5),
                    fold_ids=fold_ids)
    for _ in range(15):
        ga.iteration()
        _, fit, _ = ga.best_solution()
        print(f"gen {ga.num_generation}: conv {1.0 / fit:.4f}")


if __name__ == "__main__":
    main()
