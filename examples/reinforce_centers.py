"""REINFORCE over aggregate-center picks (role of demos/train_dataset_rl.py):
node scores parameterize Bernoulli center probabilities; the score-function
gradient of the measured convergence factor trains them — no
differentiability through the discrete pipeline needed.

    python examples/reinforce_centers.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.graph.bellman_ford import bellman_ford, nearest_center_to_agg
from mlamg_tpu.graph.topk import topk_indices
from mlamg_tpu.mg import sa_interpolation_dense
from mlamg_tpu.train import GridBundle, SolveOptions, measured_conv


def main():
    g = Grid.structured_2d_poisson_dirichlet(10, 10)
    bundle = GridBundle.from_grid(g, alpha=0.12)
    A = bundle.A
    n = g.n
    k = bundle.k
    opts = SolveOptions(max_iter=80)
    unit = A.with_data(jnp.where(A.mask, 1.0, 0.0))

    def rollout(logits, key):
        """Sample center scores with Gumbel noise -> top-k centers; return
        (conv, log-prob surrogate)."""
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (n,)) + 1e-9) + 1e-9)
        centers = topk_indices(logits + gumbel, k)
        _, nearest = bellman_ford(unit, centers)
        agg_id = nearest_center_to_agg(centers, nearest)
        P = sa_interpolation_dense(A, agg_id, k)
        conv = measured_conv(A, P, bundle.x0, opts)
        logp = jnp.sum(jax.nn.log_softmax(logits)[centers])
        return conv, logp

    logits = jnp.zeros(n)
    opt = optax.adam(5e-2)
    state = opt.init(logits)
    key = jax.random.PRNGKey(0)
    baseline = None
    batch = 8

    @jax.jit
    def batch_rollout(logits, keys):
        return jax.vmap(lambda kk: rollout(logits, kk))(keys)

    for step in range(30):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        convs, logps = batch_rollout(logits, keys)
        reward = -convs
        b = jnp.mean(reward) if baseline is None else baseline
        baseline = 0.9 * b + 0.1 * jnp.mean(reward)

        def surrogate(logits):
            _, logps = batch_rollout(logits, keys)
            return -jnp.mean(jax.lax.stop_gradient(reward - baseline) * logps)

        grads = jax.grad(surrogate)(logits)
        upd, state = opt.update(grads, state)
        logits = optax.apply_updates(logits, upd)
        if step % 5 == 0:
            print(f"step {step}: mean conv {float(jnp.mean(convs)):.4f} "
                  f"best {float(jnp.min(convs)):.4f}")


if __name__ == "__main__":
    main()
