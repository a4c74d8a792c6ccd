"""Imitation pretraining of FullAggNet (Adam, fully differentiable).

The torch reference cannot backpropagate through its pipeline (top-k +
C++ Bellman-Ford block gradients) and trains from random init with a GA
alone (utils/train_dataset.py).  Starting a GA from random init costs
hundreds of generations just to reach the classical Lloyd baseline.  This
driver exploits the jax re-design: *imitate the classical pipeline first*,
with losses that never cross the discrete ops —

- AggNet scores  -> weighted BCE against the Lloyd center indicator
  (top-k of the scores then reproduces Lloyd's seeds);
- CNet edges     -> MSE against the normalized strength measure Lloyd
  aggregates on (Bellman-Ford on C then reproduces Lloyd's assignment);
- PNet edges     -> MSE against the Jacobi-SA smoother values
  (I - w D^-1 A) on A's pattern (teacher-forced on the Lloyd aggregation).

After pretraining, the model scores ~Lloyd-parity fitness, and the GA
(train_dataset --start-model) only has to search the *improvement*
region instead of crossing the random-to-classical gap.

    python -m mlamg_tpu.cli.pretrain_dataset data/2d_iso --epochs 150 \
        --out runs_iso/pretrain.ckpt
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import dataset_bf_width, force_platform, load_dataset_grids


def build_targets(grids, alpha: float, strength_kind: str, omega: float = 2.0 / 3.0):
    """Per-grid (A CSR, k, center indicator, C values, SA values, agg)."""
    from mlamg_tpu.ops import CSR
    from mlamg_tpu.graph.lloyd import lloyd_aggregation
    from mlamg_tpu.graph.strength import strength_measure

    out = []
    key = jax.random.PRNGKey(0)
    for g in grids:
        A = g.A.tocsr()
        n = A.shape[0]
        k = max(1, int(np.ceil(alpha * n)))
        Ac = CSR.from_scipy(A, dtype=jnp.float32)
        width = int(np.diff(A.indptr).max())
        C = strength_measure(Ac, strength_kind, width=width)
        key, sub = jax.random.split(key)
        agg_id, roots, _ = lloyd_aggregation(C, ratio=alpha, key=sub)
        is_center = np.zeros(n, np.float32)
        is_center[np.asarray(roots)] = 1.0
        cvals = np.asarray(C.data, np.float32)
        # log-space target: anisotropic strength values span ~4 decades
        # (olson = evolution + 1/|a|); a linear-space MSE is dominated by
        # the large (far) distances and never fits the small (near) ones
        # that decide every Bellman-Ford assignment.  CNet's head is
        # exp()'d at eval time via matching the *normalized log*:
        cpos = np.maximum(cvals, 1e-12)
        logc = np.log(cpos)
        cvals = ((logc - logc.min()) / max(logc.max() - logc.min(), 1e-12)
                 ).astype(np.float32)
        # SA smoother values on A's pattern: delta_ij - w a_ij / d_i
        d = np.asarray(A.diagonal())
        row = np.asarray(Ac.row)
        col = np.asarray(Ac.col)
        mask = row < n
        rsafe = np.minimum(row, n - 1)
        pvals = -omega * np.asarray(Ac.data) / np.where(d[rsafe] != 0, d[rsafe], 1.0)
        pvals = np.where((row == col) & mask, 1.0 + pvals, pvals)
        pvals = np.where(mask, pvals, 0.0).astype(np.float32)
        out.append(
            (Ac, k, jnp.asarray(is_center), jnp.asarray(cvals),
             jnp.asarray(pvals), jnp.asarray(agg_id))
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Imitation pretraining of FullAggNet")
    p.add_argument("system", type=str, help="dataset folder (train/ used if present)")
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--num-conv", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--rel-strength", default=False,
                   type=lambda v: str(v).lower() in ("t", "true", "1", "yes"))
    p.add_argument("--strength-measure", default="olson")
    p.add_argument("--out", type=str, default="pretrain.ckpt")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None,
                   help="use only the first N training grids (each distinct "
                        "grid shape compiles its own program; limit for "
                        "smokes on slow hosts)")
    args = p.parse_args(argv)
    force_platform(args.platform)

    import optax
    import flax.linen as nn
    from mlamg_tpu.models import FullAggNet
    from mlamg_tpu.models.graphdata import graph_from_matrix_basic, graph_from_matrix
    from mlamg_tpu.utils import save_checkpoint

    train_grids, _ = load_dataset_grids(args.system)
    if args.limit is not None:
        train_grids = train_grids[: args.limit]
    data = build_targets(train_grids, args.alpha, args.strength_measure)
    print(f"{len(data)} training grids")

    bf_width = dataset_bf_width(train_grids)
    net = FullAggNet(dim=args.dim, num_conv=args.num_conv,
                     iterations=args.iterations, bf_width=bf_width,
                     rel_strength=args.rel_strength)
    A0, k0 = data[0][0], data[0][1]
    params = net.init(jax.random.PRNGKey(args.seed), A0, k0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def heads(mdl, A, k, agg_id):
        g = graph_from_matrix_basic(A, rel_strength=mdl.rel_strength)
        _, scores = mdl.AggNetM(g, k)
        _, bf_edges = mdl.CNet(g)
        g2 = graph_from_matrix(A, agg_id)
        _, p_edges = mdl.PNet(g2)
        return scores, bf_edges[:, 0], p_edges[:, 0]

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def step(params, opt_state, A, k, is_center, cvals, pvals, agg_id):
        def loss_fn(prm):
            scores, c_out, p_out = net.apply(
                prm, A, k, agg_id, method=heads
            )
            n = is_center.shape[0]
            pos_w = (n - k) / max(k, 1)
            logp = jax.nn.log_sigmoid(scores)
            logn = jax.nn.log_sigmoid(-scores)
            bce = -jnp.mean(pos_w * is_center * logp + (1 - is_center) * logn)
            mask = A.mask
            mse_c = jnp.sum(jnp.where(mask, (c_out - cvals) ** 2, 0)) / jnp.sum(mask)
            mse_p = jnp.sum(jnp.where(mask, (p_out - pvals) ** 2, 0)) / jnp.sum(mask)
            return bce + 10.0 * mse_c + 10.0 * mse_p, (bce, mse_c, mse_p)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, parts

    @partial(jax.jit, static_argnames=("k",))
    def center_accuracy(params, A, k, is_center, agg_id):
        from mlamg_tpu.graph.topk import topk_indices

        scores, _, _ = net.apply(params, A, k, agg_id, method=heads)
        picked = jnp.zeros_like(is_center).at[topk_indices(scores, k)].set(1.0)
        return jnp.sum(picked * is_center) / k

    rng = np.random.RandomState(args.seed)
    order = np.arange(len(data))
    for epoch in range(args.epochs):
        rng.shuffle(order)
        tot = np.zeros(4)
        for i in order:
            A, k, is_center, cvals, pvals, agg_id = data[i]
            params, opt_state, loss, parts = step(
                params, opt_state, A, k, is_center, cvals, pvals, agg_id
            )
            tot += [float(loss), *map(float, parts)]
        tot /= len(data)
        if (epoch + 1) % 10 == 0 or epoch == args.epochs - 1:
            acc = np.mean([
                float(center_accuracy(params, d[0], d[1], d[2], d[5]))
                for d in data[:16]
            ])
            print(
                f"epoch {epoch + 1}: loss {tot[0]:.4f} "
                f"(bce {tot[1]:.4f} c {tot[2]:.5f} p {tot[3]:.5f}) "
                f"center-recall@k {acc:.3f}",
                flush=True,
            )

    save_checkpoint(
        args.out, generation=0, best_params=params,
        extra=dict(net_config=dict(dim=args.dim, num_conv=args.num_conv,
                                   iterations=args.iterations,
                                   bf_width=bf_width,
                                   rel_strength=args.rel_strength)),
    )
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
