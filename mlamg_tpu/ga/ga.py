"""Vectorized genetic algorithm (role of ns/ga/parga.py).

The reference farms fitness, crossover and mutation out to MPI/multiprocess
workers by pickling whole weight vectors (parga.py:93-113).  On TPU the
population *is* an array: genetic operators are pure vectorized jax ops, and
fitness evaluation is a user-supplied function over the (P, W) population
matrix — typically the fully-jitted model+solver pipeline vmapped over
parameters (and shard_mapped over a device mesh for multi-chip; see
mlamg_tpu.parallel).  One GA generation is a handful of XLA programs, not a
command protocol.

Selection menu mirrors the reference: steady_state / roulette / greedy
(parga.py:116-188), with elitism (best individual always survives,
parga.py:247-251), restart-around-best (parga.py:217-227), and a
``stochastic_iteration`` for minibatch fitness (parga.py:254-270).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class GAConfig:
    crossover_probability: float = 0.5
    mutation_probability: float = 0.3
    mutation_min_perturb: float = -1.0
    mutation_max_perturb: float = 1.0
    steady_state_top_use: float = 1.0 / 3.0
    steady_state_bottom_discard: float = 1.0 / 3.0
    selection: str = "steady_state"  # steady_state | roulette | greedy
    restart_every: Optional[int] = None


class ParallelGA:
    """Population GA over a (P, W) array.

    Parameters
    ----------
    initial_population : (P, W) array
    fitness_func : (population (M, W), generation) -> (M,) fitness array.
        Evaluated only for individuals whose fitness is unknown.  This is
        where all the compute lives; hand it a vmapped/shard_mapped jitted
        pipeline.
    fold_ids : (W,) int32 fold assignment (see mlamg_tpu.ga.codec) or None
        for weight-wise operators.
    """

    def __init__(
        self,
        initial_population,
        fitness_func: Callable,
        config: GAConfig | None = None,
        fold_ids=None,
        key=None,
    ):
        self.population = jnp.asarray(initial_population)
        self.population_size, self.num_weights = self.population.shape
        self.fitness = jnp.zeros(self.population_size, self.population.dtype)
        self.computed = np.zeros(self.population_size, dtype=bool)
        self.fitness_func = fitness_func
        self.cfg = config or GAConfig()
        self.fold_ids = None if fold_ids is None else jnp.asarray(fold_ids)
        self.num_folds = (
            int(jnp.max(self.fold_ids)) + 1 if fold_ids is not None else None
        )
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.num_generation = 0

    # -- helpers ------------------------------------------------------------

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def compute_fitness(self):
        if self.computed.all():
            return
        idx = np.where(~self.computed)[0]
        vals = self.fitness_func(self.population[jnp.asarray(idx)], self.num_generation)
        self.fitness = self.fitness.at[jnp.asarray(idx)].set(jnp.asarray(vals))
        self.computed[idx] = True

    def best_solution(self):
        self.compute_fitness()
        i = int(jnp.argmax(self.fitness))
        return np.asarray(self.population[i]).copy(), float(self.fitness[i]), i

    # -- genetic operators (vectorized) -------------------------------------

    def _crossover_pairs(self, num: int, parents_idx, probs):
        """num offspring by fold-wise (or single-point) crossover."""
        key = self._split()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n_pairs = num // 2
        # draw parent pairs (with replacement across pairs, distinct within)
        p1 = jax.random.choice(k1, parents_idx, (n_pairs,), p=probs)
        # re-draw collisions once; exact distinctness is not load-bearing
        p2 = jax.random.choice(k2, parents_idx, (n_pairs,), p=probs)
        p2 = jnp.where(p2 == p1, parents_idx[(jnp.searchsorted(parents_idx, p2) + 1) % parents_idx.shape[0]], p2)

        do_cross = jax.random.uniform(k3, (n_pairs,)) < self.cfg.crossover_probability
        A = self.population[p1]
        B = self.population[p2]
        if self.fold_ids is not None:
            coin = jax.random.bernoulli(k4, 0.5, (n_pairs, self.num_folds))
            mask = coin[:, self.fold_ids]  # (n_pairs, W)
        else:
            pt = jax.random.randint(k4, (n_pairs, 1), 0, self.num_weights)
            mask = jnp.arange(self.num_weights)[None, :] < pt
        child1 = jnp.where(mask, A, B)
        child2 = jnp.where(mask, B, A)
        # when not crossing, children are the parents themselves
        child1 = jnp.where(do_cross[:, None], child1, A)
        child2 = jnp.where(do_cross[:, None], child2, B)
        off = jnp.concatenate([child1, child2], axis=0)
        # parents carry known fitness when not crossed
        carried = jnp.concatenate([~do_cross, ~do_cross])
        carried_fit = jnp.concatenate([self.fitness[p1], self.fitness[p2]])
        return off, carried, carried_fit

    def _selection_steady_state(self):
        n_discard = int(self.cfg.steady_state_bottom_discard * self.population_size)
        n_top = max(2, int(self.cfg.steady_state_top_use * self.population_size))
        if n_discard == 0:
            return
        order = jnp.argsort(-self.fitness)
        top = jnp.sort(order[:n_top])
        probs = jnp.ones((n_top,)) / n_top
        num = ((n_discard + 1) // 2) * 2
        off, carried, carried_fit = self._crossover_pairs(num, top, probs)
        worst = np.asarray(order[::-1][:n_discard])
        self.population = self.population.at[jnp.asarray(worst)].set(off[:n_discard])
        # Replaced rows are always marked unknown (reference parga.py:188):
        # with crossover off the offspring are parent copies, and leaving
        # them "computed" would silently disable mutation -> a no-op GA.
        self.computed[worst] = False

    def _selection_roulette(self):
        probs = self.fitness / jnp.maximum(jnp.sum(jnp.abs(self.fitness)), 1e-30)
        probs = jnp.maximum(probs, 0)
        probs = probs / jnp.maximum(probs.sum(), 1e-30)
        num = ((self.population_size + 1) // 2) * 2
        idx = jnp.arange(self.population_size)
        off, carried, carried_fit = self._crossover_pairs(num, idx, probs)
        self.population = off[: self.population_size]
        self.fitness = carried_fit[: self.population_size]
        self.computed = np.asarray(carried[: self.population_size]).copy()

    def _selection_greedy(self):
        best, fit, _ = self.best_solution()
        self.population = jnp.broadcast_to(
            jnp.asarray(best)[None, :], self.population.shape
        )
        self.fitness = jnp.full_like(self.fitness, fit)
        self.computed[:] = False

    def _mutation(self):
        new = np.where(~self.computed)[0]
        if len(new) == 0:
            return
        key = self._split()
        k1, k2 = jax.random.split(key)
        rows = jnp.asarray(new)
        sub = self.population[rows]
        lo, hi = self.cfg.mutation_min_perturb, self.cfg.mutation_max_perturb
        if self.fold_ids is not None:
            coin = jax.random.bernoulli(
                k1, self.cfg.mutation_probability, (len(new), self.num_folds)
            )
            mask = coin[:, self.fold_ids]
        else:
            mask = jax.random.bernoulli(
                k1, self.cfg.mutation_probability, sub.shape
            )
        noise = jax.random.uniform(k2, sub.shape, sub.dtype, minval=lo, maxval=hi)
        self.population = self.population.at[rows].set(sub + noise * mask)
        self.computed[new] = False

    def restart(self):
        """Re-seed population around the best (reference parga.py:217-227)."""
        best, fit, _ = self.best_solution()
        key = self._split()
        noise = jax.random.uniform(
            key,
            (self.population_size - 1, self.num_weights),
            self.population.dtype,
            minval=-1.0,
            maxval=1.0,
        )
        b = jnp.asarray(best)
        self.population = jnp.concatenate([b[None, :], b[None, :] + noise], axis=0)
        self.fitness = self.fitness.at[0].set(fit)
        self.computed[:] = False
        self.computed[0] = True

    # -- iterations ---------------------------------------------------------

    def iteration(self):
        cfg = self.cfg
        if (
            cfg.restart_every is not None
            and self.num_generation > 0
            and self.num_generation % cfg.restart_every == 0
        ):
            self.restart()
        self.num_generation += 1
        best, best_fit, _ = self.best_solution()
        {
            "steady_state": self._selection_steady_state,
            "roulette": self._selection_roulette,
            "greedy": self._selection_greedy,
        }[cfg.selection]()
        if cfg.mutation_probability != 0.0:
            self._mutation()
        self.compute_fitness()
        # elitism: previous best replaces current worst
        worst = int(jnp.argmin(self.fitness))
        self.population = self.population.at[worst].set(jnp.asarray(best))
        self.fitness = self.fitness.at[worst].set(best_fit)
        self.computed[worst] = True

    def stochastic_iteration(self):
        """Minibatch-fitness variant: recompute everything against the
        current batch first (reference parga.py:254-270)."""
        self.num_generation += 1
        self.computed[:] = False
        self.compute_fitness()
        best, best_fit, _ = self.best_solution()
        {
            "steady_state": self._selection_steady_state,
            "roulette": self._selection_roulette,
            "greedy": self._selection_greedy,
        }[self.cfg.selection]()
        self._mutation()
        self.compute_fitness()
        worst = int(jnp.argmin(self.fitness))
        self.population = self.population.at[worst].set(jnp.asarray(best))
        self.fitness = self.fitness.at[worst].set(best_fit)
        self.computed[worst] = True
