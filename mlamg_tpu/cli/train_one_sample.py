"""GA training on a single problem (role of utils/train_one_sample.py,
with its stale worker-pool wiring fixed — SURVEY.md §2.1).

    python -m mlamg_tpu.cli.train_one_sample --problem 2d --n 10 --max-generations 20
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import parse_bool_str
from mlamg_tpu.data import Grid
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population
from mlamg_tpu.train import GridBundle, SolveOptions, make_population_fitness, lloyd_reference_conv
from mlamg_tpu.utils import save_checkpoint


def build_problem(args) -> Grid:
    if args.problem == "1d":
        return Grid.structured_1d_poisson_dirichlet(args.n)
    if args.problem == "2d":
        return Grid.structured_2d_poisson_dirichlet(args.n, args.n)
    if args.problem == "2d-aniso":
        return Grid.structured_2d_poisson_dirichlet(args.n, args.n, args.epsilon, args.theta)
    if args.problem == "file":
        return Grid.load(args.file)
    raise ValueError(args.problem)


def main(argv=None):
    p = argparse.ArgumentParser(description="GA training on one problem")
    p.add_argument("--problem", default="2d", choices=["1d", "2d", "2d-aniso", "file"])
    p.add_argument("--n", type=int, default=12)
    p.add_argument("--epsilon", type=float, default=1.0)
    p.add_argument("--theta", type=float, default=0.0)
    p.add_argument("--file", type=str, default=None)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--max-generations", type=int, default=100)
    p.add_argument("--population-size", type=int, default=16)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--res-tol", type=float, default=1e-6)
    p.add_argument("--checkpoint-dir", type=str, default="models_chkpt")
    args = p.parse_args(argv)

    g = build_problem(args)
    opts = SolveOptions(res_tol=args.res_tol)
    bundle = GridBundle.from_grid(g, args.alpha)
    bundle.ref_conv = max(lloyd_reference_conv(bundle, "abs", opts), 1e-6)
    print(f"n={g.n} k={bundle.k} lloyd benchmark conv={bundle.ref_conv:.4f}")

    net = FullAggNet(dim=args.dim, num_conv=2, iterations=2)
    params = net.init(jax.random.PRNGKey(0), bundle.A, bundle.k)
    vec, unravel, fold_ids, _ = flatten_params(params)
    fitness = make_population_fitness(net, unravel, [bundle], opts)
    pop0 = init_population(jax.random.PRNGKey(1), vec, args.population_size, perturb=0.5)
    ga = ParallelGA(
        pop0, fitness,
        GAConfig(mutation_probability=1.0, mutation_min_perturb=-0.5,
                 mutation_max_perturb=0.5, steady_state_top_use=0.5,
                 steady_state_bottom_discard=0.5),
        fold_ids=fold_ids,
    )
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    for i in range(args.max_generations):
        ga.iteration()
        best, fit, _ = ga.best_solution()
        print(f"gen {ga.num_generation}: train conv ratio {1.0 / fit:.4f} "
              f"(abs conv ~{bundle.ref_conv / fit:.4f})")
        save_checkpoint(
            os.path.join(args.checkpoint_dir, "one_sample.ckpt"),
            generation=ga.num_generation,
            best_params=unravel(jnp.asarray(best)),
            population=ga.population, fitness=ga.fitness, key=ga.key,
        )


if __name__ == "__main__":
    main()
