"""Differentiable top-k aggregation training (role of demos/diff_top_k.py):
learn node scores end-to-end through a soft top-k relaxation, unit-BF
aggregation held fixed per step, SA smoothing and the AMG loss.

    python examples/diff_topk_training.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.graph.topk import soft_topk_mask, topk_indices
from mlamg_tpu.graph.bellman_ford import bellman_ford, nearest_center_to_agg
from mlamg_tpu.mg.interp import tentative_dense, sa_omega
from mlamg_tpu.models import amg_loss, make_test_vectors
from mlamg_tpu.ops.matmul import spmm


def main():
    g = Grid.structured_2d_poisson_dirichlet(10, 10)
    A = CSR.from_scipy(g.A)
    n = g.n
    k = max(4, n // 10)
    tv = make_test_vectors(n, 6)
    unit = A.with_data(jnp.where(A.mask, 1.0, 0.0))
    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    omega = sa_omega(A, Dinv)

    def soft_P(scores):
        """Soft assignment: hard BF aggregation from the current top-k, but
        P columns weighted by the soft scores so gradients reach them."""
        centers = topk_indices(scores, k)
        _, nearest = bellman_ford(unit, centers)
        agg_id = nearest_center_to_agg(centers, nearest)
        T = tentative_dense(agg_id, k, dtype=jnp.float32)
        soft = soft_topk_mask(scores, k, sigma=0.3)
        T = T * (0.5 + 0.5 * soft[centers])[None, :]
        return T - omega * Dinv[:, None] * spmm(A, T)

    def loss_fn(scores):
        return amg_loss(soft_P(scores), A, tv)

    key = jax.random.PRNGKey(0)
    scores = 0.01 * jax.random.normal(key, (n,))
    opt = optax.adam(5e-2)
    state = opt.init(scores)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for i in range(100):
        val, grads = vg(scores)
        upd, state = opt.update(grads, state)
        scores = optax.apply_updates(scores, upd)
        if i % 20 == 0:
            print(f"step {i}: loss {float(val):.4f}")
    print(f"final loss: {float(loss_fn(scores)):.4f}")


if __name__ == "__main__":
    main()
