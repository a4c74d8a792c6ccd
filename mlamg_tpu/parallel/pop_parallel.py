"""Population-parallel fitness evaluation over a device mesh.

Role of the reference's population scatter (parga.py:93-113): there, weight
vectors are pickled to MPI workers; here the (P, W) population array is
sharded over the mesh's ``pop`` axis and the (already vmapped) fitness
pipeline runs under ``shard_map`` — each device evaluates its population
shard with zero host involvement, and the gathered fitness comes back as
one sharded array.  Cross-device traffic is one all-gather of (P,) floats.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_population_eval(fitness_vmapped: Callable, mesh: Mesh) -> Callable:
    """Wrap a vmapped fitness f((M, W)) -> (M,) into a pop-sharded evaluator.

    The returned function takes the full (P, W) population (P divisible by
    the pop-axis size; pad the population if needed) and returns (P,)
    fitness, computed shard-locally.
    """

    @jax.jit
    def sharded(pop):
        return jax.shard_map(
            fitness_vmapped,
            mesh=mesh,
            in_specs=P("pop", None),
            out_specs=P("pop"),
            check_vma=False,
        )(pop)

    def evaluate(population: jax.Array) -> jax.Array:
        n_pop = mesh.shape["pop"]
        Psize = population.shape[0]
        pad = (-Psize) % n_pop
        if pad:
            population = jnp.concatenate(
                [population, jnp.repeat(population[-1:], pad, axis=0)], axis=0
            )
        population = jax.device_put(
            population, NamedSharding(mesh, P("pop", None))
        )
        out = sharded(population)
        return out[:Psize]

    return evaluate
