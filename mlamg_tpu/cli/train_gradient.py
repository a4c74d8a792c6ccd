"""Gradient (Adam) dataset training of FullAggNet via the soft pipeline.

The headline TPU-native training mode.  The torch reference can only train
its model with a genetic algorithm (utils/train_dataset.py) because its
forward pass is non-differentiable (hard top-k + C++ Bellman-Ford); the
jax re-design's forward is one XLA program end to end, so this driver
trains the exact same parameter vector by backpropagating through a soft
relaxation of the pipeline (models/soft_pipeline.py) against the
differentiable two-level convergence factor (models/loss.py).

Per step: ONE jitted value-and-grad program per shape bucket evaluates the
whole training set (vmap over grids), so one Adam step costs one
accelerator dispatch per bucket.  The *discrete* pipeline (the thing the
GA optimizes and evaluate_dataset measures) is evaluated every
--eval-every steps on train and test; the best-by-discrete-train
parameters are checkpointed in the same format train_dataset consumes, so
a GA run can fine-tune from the gradient solution (--start-model).

    python -m mlamg_tpu.cli.train_gradient data_out/2d_iso \
        --steps 600 --out runs_iso_grad
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import (
    load_dataset_grids,
    compute_reference_convs,
    dataset_bf_width,
    force_platform,
)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Differentiable (Adam) training of FullAggNet"
    )
    p.add_argument("system", type=str)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--num-conv", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--rel-strength", default=False,
                   type=lambda v: str(v).lower() in ("t", "true", "1", "yes"),
                   help="row-normalized strength edge feature (see "
                        "cli/common.py add_training_args)")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--lr-decay", type=float, default=0.3,
                   help="final lr = lr * lr_decay (cosine schedule)")
    p.add_argument("--bucket-step", type=int, default=512)
    p.add_argument("--grid-chunk", type=int, default=None,
                   help="evaluate gradients in sub-batches of this many "
                        "grids per dispatch (bounds NNConv's E x dim^2 "
                        "activation memory on large models)")
    p.add_argument("--bf-iters", type=int, default=24)
    p.add_argument("--tau-assign", type=float, default=0.08)
    p.add_argument("--tau-final", type=float, default=None,
                   help="anneal assignment temperature to this value "
                        "(exponential in step; default: no annealing)")
    p.add_argument("--topk-sigma", type=float, default=0.5)
    p.add_argument("--weight-noise", type=float, default=0.0,
                   help="relative Gaussian parameter noise per step (e.g. "
                        "0.01): optimizes the expected soft loss under "
                        "perturbation, preferring flat minima whose "
                        "discrete top-k/BF decisions keep a margin — the "
                        "measured conv of the hard pipeline is chaotic in "
                        "the weights, so sharp minima do not transfer "
                        "across platforms/compilation modes")
    p.add_argument("--ridge", type=float, default=1e-4)
    p.add_argument("--test-vectors", type=int, default=16)
    p.add_argument("--num-loops", type=int, default=5)
    p.add_argument("--eval-every", type=int, default=25)
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--max-iter", type=int, default=75)
    p.add_argument("--smoother", default="multicolor_gs")
    p.add_argument("--strength-measure", default="olson")
    p.add_argument("--start-model", type=str, default=None)
    p.add_argument("--out", type=str, default="runs_grad")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--compile-cache", type=str, default=None)
    args = p.parse_args(argv)
    force_platform(args.platform)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax
    from mlamg_tpu.models import FullAggNet
    from mlamg_tpu.models.soft_pipeline import SoftConfig, soft_conv_loss
    from mlamg_tpu.train import (
        SolveOptions,
        make_buckets,
        make_population_fitness_bucketed,
    )
    from mlamg_tpu.ga import flatten_params
    from mlamg_tpu.utils import MetricsWriter, save_checkpoint, load_checkpoint

    opts = SolveOptions(max_iter=args.max_iter, smoother=args.smoother)
    train_grids, test_grids = load_dataset_grids(args.system)
    if args.limit:
        train_grids = train_grids[: args.limit]
        test_grids = test_grids[: max(1, args.limit // 4)]
    dtype = jnp.float32
    train, train_buckets = make_buckets(
        train_grids, args.alpha, dtype, step=args.bucket_step
    )
    test, test_buckets = make_buckets(
        test_grids, args.alpha, dtype, step=args.bucket_step
    )
    print(f"loaded {len(train)} train / {len(test)} test grids "
          f"({len(train_buckets)} train buckets)", flush=True)

    cache = lambda sub: os.path.join(
        args.system, sub, f".ref_convs_{args.strength_measure}.json"
    ) if os.path.isdir(os.path.join(args.system, sub)) else None
    tr_ref = compute_reference_convs(
        train, args.strength_measure, opts, grids=train_grids,
        cache_path=cache("train"),
    )
    te_ref = compute_reference_convs(
        test, args.strength_measure, opts, grids=test_grids,
        cache_path=cache("test"),
    )
    print(f"train Lloyd benchmark conv: {tr_ref.mean():.4f}", flush=True)
    print(f"test Lloyd benchmark conv: {te_ref.mean():.4f}", flush=True)

    bf_width = dataset_bf_width(train_grids)
    start_ck = load_checkpoint(args.start_model) if args.start_model else None
    if start_ck:
        nc0 = (start_ck.get("extra") or {}).get("net_config") or {}
        bf_width = max(bf_width, int(nc0.get("bf_width", 0)))
        args.rel_strength = bool(nc0.get("rel_strength", args.rel_strength))
    net = FullAggNet(
        dim=args.dim, num_conv=args.num_conv, iterations=args.iterations,
        bf_width=bf_width, rel_strength=args.rel_strength,
    )
    # the BF width is part of the trained forward: checkpoints carry it so
    # evaluators reconstruct the exact architecture instead of re-deriving
    # a (possibly smaller) width from the eval split
    net_config = dict(dim=args.dim, num_conv=args.num_conv,
                      iterations=args.iterations, bf_width=bf_width,
                      rel_strength=args.rel_strength)
    A0 = jax.tree_util.tree_map(lambda x: x[0], train_buckets[0].A)
    params = net.init(jax.random.PRNGKey(args.seed), A0, train_buckets[0].k)
    if start_ck:
        params = start_ck["best_params"]
    vec, unravel, _, _ = flatten_params(params)
    vec = jnp.asarray(vec, jnp.float32)
    print(f"{vec.shape[0]} weights", flush=True)

    cfg = SoftConfig(
        bf_iters=args.bf_iters,
        tau_assign=args.tau_assign,
        topk_sigma=args.topk_sigma,
        num_loops=args.num_loops,
        test_vectors=args.test_vectors,
        ridge=args.ridge,
    )

    # fixed unit-norm test vectors per grid, zero on padding rows
    def bucket_vecs(b, salt):
        key = jax.random.PRNGKey(args.seed * 9973 + salt)
        n_pad = b.A.shape[0]
        tv = jax.random.normal(
            key, (len(b.idx), n_pad, cfg.test_vectors), jnp.float32
        )
        node = jnp.arange(n_pad)
        tv = jnp.where(node[None, :, None] < b.n_real[:, None, None], tv, 0.0)
        return tv / jnp.maximum(jnp.linalg.norm(tv, axis=1, keepdims=True), 1e-30)

    if args.grid_chunk:
        # split buckets into fixed-size grid chunks (each chunk size jits
        # its own program; at most two distinct sizes per bucket)
        import dataclasses as _dc

        def split(b):
            B = len(b.idx)
            c = args.grid_chunk
            outs = []
            for s in range(0, B, c):
                e = min(s + c, B)
                outs.append(
                    _dc.replace(
                        b,
                        A=jax.tree_util.tree_map(lambda x: x[s:e], b.A),
                        x0=b.x0[s:e],
                        n_real=b.n_real[s:e],
                        k_real=b.k_real[s:e],
                        colors=b.colors[s:e],
                        idx=b.idx[s:e],
                    )
                )
            return outs

        train_buckets = [c for b in train_buckets for c in split(b)]

    ref_by_bucket = [
        jnp.asarray([train[i].ref_conv for i in b.idx]) for b in train_buckets
    ]
    tvs_by_bucket = [bucket_vecs(b, s) for s, b in enumerate(train_buckets)]
    weights = np.asarray([len(b.idx) for b in train_buckets], np.float32)
    weights = weights / weights.sum()

    def bucket_loss(vec, b, tvs, refs, tau):
        params = unravel(vec)
        c = dataclass_replace(cfg, tau_assign=tau)

        def per_grid(A, tv, n_real, k_real, colors):
            conv, _ = soft_conv_loss(
                net, params, A, b.k, tv, c, pad=(n_real, k_real),
                colors=colors, num_colors=b.num_colors,
            )
            return conv

        convs = jax.vmap(per_grid)(b.A, tvs, b.n_real, b.k_real, b.colors)
        return jnp.mean(convs / refs)

    import dataclasses

    def dataclass_replace(c, **kw):
        return dataclasses.replace(c, **kw)

    opt = optax.chain(
        optax.clip_by_global_norm(100.0),
        optax.adam(
            optax.cosine_decay_schedule(
                args.lr, args.steps, alpha=args.lr_decay
            )
        ),
    )
    opt_state = opt.init(vec)

    wn_scale = (
        float(jnp.sqrt(jnp.mean(vec ** 2))) * args.weight_noise
        if args.weight_noise else 0.0
    )

    step_fns = []
    for bi, b in enumerate(train_buckets):
        @jax.jit
        def step_grad(vec, tau, nkey, bi=bi, b=b):
            if wn_scale:
                vec = vec + wn_scale * jax.random.normal(
                    nkey, vec.shape, vec.dtype
                )
            return jax.value_and_grad(bucket_loss)(
                vec, b, tvs_by_bucket[bi], ref_by_bucket[bi], tau
            )

        step_fns.append(step_grad)

    @jax.jit
    def apply_update(vec, g, opt_state):
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(vec, up), opt_state

    train_fit = make_population_fitness_bucketed(
        net, unravel, train, train_buckets, opts
    )
    test_fit = make_population_fitness_bucketed(
        net, unravel, test, test_buckets, opts
    )

    def discrete_losses(vec):
        tr = 1.0 / float(train_fit(vec[None, :], 0)[0])
        te = 1.0 / float(test_fit(vec[None, :], 0)[0])
        return tr, te

    os.makedirs(args.out, exist_ok=True)
    writer = MetricsWriter(os.path.join(args.out, "runs"))
    best = (np.inf, None)  # (discrete train loss, vec)

    def tau_at(step):
        if args.tau_final is None:
            return args.tau_assign
        f = step / max(args.steps - 1, 1)
        return float(
            args.tau_assign * (args.tau_final / args.tau_assign) ** f
        )

    import time

    t0 = time.time()
    nkey0 = jax.random.PRNGKey(args.seed * 31 + 17)
    for it in range(args.steps):
        tau = tau_at(it)
        loss_tot, g_tot = 0.0, None
        for bi in range(len(train_buckets)):
            l, g = step_fns[bi](vec, tau, jax.random.fold_in(nkey0, it * 131 + bi))
            w = float(weights[bi])
            loss_tot += w * float(l)
            g_tot = g * w if g_tot is None else g_tot + g * w
        vec, opt_state = apply_update(vec, g_tot, opt_state)

        if (it + 1) % args.eval_every == 0 or it == args.steps - 1:
            tr, te = discrete_losses(vec)
            if tr < best[0]:
                best = (tr, np.asarray(vec).copy())
            print(
                f"step {it + 1}: soft {loss_tot:.4f} "
                f"discrete train {tr:.4f} test {te:.4f} "
                f"(best {best[0]:.4f}, tau {tau:.3f}, "
                f"{(time.time() - t0) / (it + 1):.2f}s/step)",
                flush=True,
            )
            writer.add_scalars(
                "Loss/Train", {"ML-soft": loss_tot, "ML-discrete": tr,
                               "Lloyd": 1.0}, it + 1,
            )
            writer.add_scalars(
                "Loss/Test", {"ML-discrete": te, "Lloyd": 1.0}, it + 1
            )
        if (it + 1) % args.checkpoint_every == 0 or it == args.steps - 1:
            bvec = best[1] if best[1] is not None else np.asarray(vec)
            save_checkpoint(
                os.path.join(args.out, "grad_best.ckpt"),
                generation=it + 1,
                best_params=unravel(jnp.asarray(bvec)),
                extra=dict(net_config=net_config),
            )

    tr, te = discrete_losses(jnp.asarray(best[1] if best[1] is not None else vec))
    summary = dict(
        steps=args.steps,
        best_discrete_train=float(best[0]),
        final_discrete_train=float(tr),
        final_discrete_test=float(te),
        train_lloyd_conv=float(tr_ref.mean()),
        test_lloyd_conv=float(te_ref.mean()),
    )
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    writer.close()


if __name__ == "__main__":
    main()
