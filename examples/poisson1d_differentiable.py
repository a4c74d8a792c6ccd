"""Differentiable interpolation training on 1D Poisson (role of
demos/1d_poisson.py): optimize the values of P with Adam against the
softmax-weighted AMG convergence loss, then compare the measured two-level
convergence factor against Jacobi smoothed aggregation.

    python examples/poisson1d_differentiable.py [--n 32] [--steps 200]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.mg import sa_interpolation_dense, twolevel_solve
from mlamg_tpu.models import amg_loss, make_test_vectors


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--agg-size", type=int, default=4)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    g = Grid.structured_1d_poisson_dirichlet(args.n)
    A = CSR.from_scipy(g.A)
    n = g.n
    k = n // args.agg_size
    agg = jnp.asarray(np.arange(n) // args.agg_size)

    P_sa = sa_interpolation_dense(A, agg, k)

    # resample test vectors each step (stochastic loss): optimizing a fixed
    # small batch overfits the transient and hurts the asymptotic factor
    @jax.jit
    def loss_and_grad(P, key):
        tv = make_test_vectors(n, 16, key=key)
        return jax.value_and_grad(lambda P: amg_loss(P, A, tv, tot_num_loop=8))(P)

    P = P_sa
    opt = optax.adam(args.lr)
    state = opt.init(P)
    key = jax.random.PRNGKey(0)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        val, grads = loss_and_grad(P, sub)
        upd, state = opt.update(grads, state)
        P = optax.apply_updates(P, upd)
        if i == 0 or (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(val):.4f}")

    x0 = np.random.RandomState(0).randn(n)
    x0 /= np.linalg.norm(x0)
    for name, Pm in [("SA", P_sa), ("learned", P)]:
        _, conv, _, iters = twolevel_solve(
            A, Pm, jnp.zeros(n), jnp.asarray(x0, P.dtype), res_tol=1e-6, max_iter=200
        )
        print(f"{name:8s} conv factor: {float(conv):.4f} ({int(iters)} iters)")


if __name__ == "__main__":
    main()
