"""Continuous (fully differentiable) interpolation networks.

Role of ns/model/interpolation.py: learn interpolation *weights* (and soft
C/F scores) with plain gradient descent against energy-norm losses, no
discrete pipeline in the way.

TPU re-design highlights: the reference builds P̂ one column at a time in a
python loop over all n nodes (interpolation.py:110-117); here the per-column
network is ``vmap``-ed over columns, so the whole P̂ assembles as one batched
TAGConv computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.models.graphdata import GraphData
from mlamg_tpu.models.gnn import TAGConv
from mlamg_tpu.ops.sparse import CSR


class InterpolationNetwork(nn.Module):
    """Per-column interpolation net: input features [delta_i, c] -> TAGConv
    stack -> column i of P-hat (reference interpolation.py:44-67).

    K is configurable (reference uses K=50 — deep propagation).
    """

    K: int = 50
    dims: tuple = (15, 30, 15, 1)

    @nn.compact
    def __call__(self, g: GraphData, c: jax.Array, i: jax.Array):
        n = g.n
        delta = jax.nn.one_hot(i, n, dtype=c.dtype)
        x = jnp.stack([delta, c], axis=1)
        ew = g.edge_attr[:, 0]
        for j, d in enumerate(self.dims):
            x = nn.relu(TAGConv(d, K=self.K, name=f"tag_{j}")(g, x, ew))
        return x[:, 0]


class CoarseFineNetwork(nn.Module):
    """Soft C/F scores in (0, 1) via a sigmoid TAGConv stack
    (reference interpolation.py:76-94)."""

    K: int = 20
    dims: tuple = (60, 100, 200, 80, 1)

    @nn.compact
    def __call__(self, g: GraphData):
        x = g.x
        ew = g.edge_attr[:, 0]
        for j, d in enumerate(self.dims):
            x = TAGConv(d, K=self.K, name=f"tag_{j}")(g, x, ew)
            x = nn.relu(x) if j < len(self.dims) - 1 else nn.sigmoid(x)
        return x[:, 0]


class ContinuousInterpolationFullNetwork(nn.Module):
    """C/F scores + full P-hat, columns vmapped
    (reference interpolation.py:97-129)."""

    K_interp: int = 50
    K_cf: int = 20

    def setup(self):
        self.P = InterpolationNetwork(K=self.K_interp)
        self.CF = CoarseFineNetwork(K=self.K_cf)

    def __call__(self, g: GraphData):
        c = self.CF(g)
        cols = jnp.arange(g.n)
        Phat = jax.vmap(lambda i: self.P(g, c, i), out_axes=1)(cols)  # (n, n)
        return Phat, c


def EC_loss(A, Phat: jax.Array, c: jax.Array, R: jax.Array) -> jax.Array:
    """Relaxed two-level energy loss with soft C/F penalties
    (reference interpolation.py:149-158):

        Pbar = Phat diag(c)
        || R (I - Pbar (Pbar^T A Pbar + I - diag(c))^-1 Pbar^T A) R ||_F^2
        + 0.001 ||c||_1 + 0.01 ||(1-c) c||_2
    """
    n = A.shape[0]
    Ad = A.todense() if isinstance(A, CSR) else A
    Pbar = Phat * c[None, :]
    I = jnp.eye(n, dtype=Ad.dtype)
    M = Pbar.T @ Ad @ Pbar + I - jnp.diag(c)
    G = I - Pbar @ jnp.linalg.solve(M, Pbar.T @ Ad)
    E = R @ G @ R
    return (
        jnp.linalg.norm(E, "fro") ** 2
        + 0.001 * jnp.sum(jnp.abs(c))
        + 0.01 * jnp.linalg.norm((1 - c) * c)
    )


def E_loss_discrete(A, P: jax.Array, R: jax.Array) -> jax.Array:
    """|| R (I - P (P^T A P)^-1 P^T A) R ||_F^2
    (reference interpolation.py:143-147)."""
    n = A.shape[0]
    Ad = A.todense() if isinstance(A, CSR) else A
    I = jnp.eye(n, dtype=Ad.dtype)
    G = I - P @ jnp.linalg.solve(P.T @ Ad @ P, P.T @ Ad)
    E = R @ G @ R
    return jnp.linalg.norm(E, "fro") ** 2
