"""Gradient-free optimizers (role of ns/optimize/*).

- :class:`PseudoGradientOptimizer` — Adam-style moment update driven by a
  pluggable pseudo-gradient estimate (reference base_optimizer.py:22-64).
- :class:`SPSA` — simultaneous-perturbation two-point gradient estimate
  (reference spsa.py:17-22), vectorized over the whole weight vector.
- :class:`CuckooSearch` — Lévy-flight search (the reference's cuckoo.py is
  dead code with undefined variables, SURVEY.md §2.1; this is a working
  implementation of the same published algorithm).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


class PseudoGradientOptimizer:
    """Adam moments over a pseudo-gradient callback g(x, key) -> (W,)."""

    def __init__(self, grad_estimate: Callable, lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8):
        self.g = grad_estimate
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.m = None
        self.v = None
        self.t = 0

    def step(self, x: jax.Array, key) -> jax.Array:
        g = self.g(x, key)
        if self.m is None:
            self.m = jnp.zeros_like(x)
            self.v = jnp.zeros_like(x)
        self.t += 1
        self.m = self.b1 * self.m + (1 - self.b1) * g
        self.v = self.b2 * self.v + (1 - self.b2) * g * g
        mhat = self.m / (1 - self.b1**self.t)
        vhat = self.v / (1 - self.b2**self.t)
        return x - self.lr * mhat / (jnp.sqrt(vhat) + self.eps)


class SPSA(PseudoGradientOptimizer):
    """Two-point simultaneous-perturbation gradient of scalar f."""

    def __init__(self, f: Callable, c: float = 1e-2, **kw):
        self.f = f
        self.c = c

        def grad(x, key):
            delta = jnp.sign(jax.random.rademacher(key, x.shape, jnp.float32)).astype(
                x.dtype
            )
            fp = self.f(x + self.c * delta)
            fm = self.f(x - self.c * delta)
            return (fp - fm) / (2 * self.c) * delta

        super().__init__(grad, **kw)


class CuckooSearch:
    """Cuckoo search with Lévy flights over a (P, W) population."""

    def __init__(self, f: Callable, pop: jax.Array, pa: float = 0.25, alpha: float = 0.01, beta: float = 1.5, key=None):
        self.f = f
        self.pop = jnp.asarray(pop)
        self.pa, self.alpha, self.beta = pa, alpha, beta
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.fitness = jax.vmap(f)(self.pop)

    def _levy(self, key, shape):
        # Mantegna's algorithm
        beta = self.beta
        from math import gamma, pi, sin

        sigma = (
            gamma(1 + beta) * sin(pi * beta / 2)
            / (gamma((1 + beta) / 2) * beta * 2 ** ((beta - 1) / 2))
        ) ** (1 / beta)
        k1, k2 = jax.random.split(key)
        u = jax.random.normal(k1, shape) * sigma
        v = jnp.abs(jax.random.normal(k2, shape))
        return u / v ** (1 / beta)

    def step(self):
        P, W = self.pop.shape
        self.key, k1, k2, k3 = jax.random.split(self.key, 4)
        best = self.pop[jnp.argmin(self.fitness)]
        # Lévy flight toward the best
        step = self.alpha * self._levy(k1, (P, W)) * (self.pop - best[None, :])
        cand = self.pop + step
        cand_fit = jax.vmap(self.f)(cand)
        improve = cand_fit < self.fitness
        self.pop = jnp.where(improve[:, None], cand, self.pop)
        self.fitness = jnp.where(improve, cand_fit, self.fitness)
        # abandon a fraction pa of worst nests
        drop = jax.random.bernoulli(k2, self.pa, (P,))
        i, j = jax.random.randint(k3, (2, P), 0, P)
        new = self.pop + jax.random.uniform(self.key, (P, 1)) * (self.pop[i] - self.pop[j])
        new_fit = jax.vmap(self.f)(new)
        take = drop & (new_fit < self.fitness)
        self.pop = jnp.where(take[:, None], new, self.pop)
        self.fitness = jnp.where(take, new_fit, self.fitness)

    def best(self):
        i = int(jnp.argmin(self.fitness))
        return self.pop[i], float(self.fitness[i])
