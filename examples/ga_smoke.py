"""GA smoke tests (role of demos/ga-test.py and demos/ga_torch_test.py):
fit a quadratic, then train a tiny MLP regression, both with the
vectorized GA.

    python examples/ga_smoke.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population


def quadratic():
    target = jnp.asarray([4.0, -2.0, 3.5])

    def fitness(pop, gen):
        return 1.0 / (jnp.sum((pop - target) ** 2, axis=1) + 1e-6)

    pop0 = init_population(jax.random.PRNGKey(0), jnp.zeros(3), 32, perturb=2.0)
    ga = ParallelGA(pop0, fitness,
                    GAConfig(mutation_probability=0.6,
                             mutation_min_perturb=-0.3, mutation_max_perturb=0.3,
                             steady_state_top_use=0.5, steady_state_bottom_discard=0.5))
    gen = 0
    while ga.best_solution()[1] < 10.0 and gen < 200:
        ga.iteration()
        gen += 1
    best, fit, _ = ga.best_solution()
    print(f"quadratic: fitness {fit:.2f} after {gen} generations, x = {best}")
    assert fit > 10.0


def tiny_mlp():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(jnp.tanh(nn.Dense(8)(x)))

    m = M()
    X = jnp.linspace(-1, 1, 32)[:, None]
    Y = jnp.sin(3 * X)
    params = m.init(jax.random.PRNGKey(0), X)
    vec, unravel, fold_ids, _ = flatten_params(params)

    def fitness(pop, gen):
        def loss(v):
            return jnp.mean((m.apply(unravel(v), X) - Y) ** 2)

        return 1.0 / (jax.vmap(loss)(pop) + 1e-9)

    pop0 = init_population(jax.random.PRNGKey(1), vec, 32, perturb=1.0)
    ga = ParallelGA(pop0, fitness,
                    GAConfig(mutation_probability=0.8,
                             mutation_min_perturb=-0.2, mutation_max_perturb=0.2,
                             steady_state_top_use=0.5, steady_state_bottom_discard=0.5),
                    fold_ids=fold_ids)
    gen = 0
    while 1.0 / ga.best_solution()[1] > 1e-2 and gen < 300:
        ga.iteration()
        gen += 1
    print(f"mlp: loss {1.0 / ga.best_solution()[1]:.5f} after {gen} generations")


if __name__ == "__main__":
    quadratic()
    tiny_mlp()
