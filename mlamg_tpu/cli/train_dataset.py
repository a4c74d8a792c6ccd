"""GA dataset training (role of utils/train_dataset.py).

Example:
    python -m mlamg_tpu.cli.train_dataset data/2d_iso --max-generations 50 \
        --population-size 16 --alpha 0.1

The fitness of the whole population per grid runs as one jitted vmapped XLA
program; pass --mesh-pop N to shard it over N devices.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import (
    add_training_args,
    load_dataset_grids,
    compute_reference_convs,
    dataset_bf_width,
    force_platform,
)
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.ga import ParallelGA, GAConfig, flatten_params, init_population
from mlamg_tpu.train import (
    GridBundle,
    SolveOptions,
    make_buckets,
    make_population_fitness,
    make_population_fitness_bucketed,
)
from mlamg_tpu.utils import Profiler, MetricsWriter, save_checkpoint, load_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser(description="GA training of FullAggNet on a .grid dataset")
    add_training_args(parser)
    args = parser.parse_args(argv)
    force_platform(args.platform)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.float64 if args.float64 else jnp.float32
    if args.float64:
        jax.config.update("jax_enable_x64", True)
    Profiler.enabled = True

    opts = SolveOptions(
        res_tol=args.res_tol, max_iter=args.max_iter,
        pre_smooth=args.pre_smooth, post_smooth=args.post_smooth,
        smoother=args.smoother, use_error_norm=args.error_norm,
    )
    train_grids, test_grids = load_dataset_grids(args.system)
    if args.bucketed:
        train, train_buckets = make_buckets(
            train_grids, args.alpha, dtype, step=args.bucket_step
        )
        test, test_buckets = make_buckets(
            test_grids, args.alpha, dtype, step=args.bucket_step
        )
    else:
        train = [GridBundle.from_grid(g, args.alpha, dtype) for g in train_grids]
        test = [GridBundle.from_grid(g, args.alpha, dtype) for g in test_grids]
    print(f"loaded {len(train)} train / {len(test)} test grids")

    if args.evaluate_bench_loss:
        with Profiler("lloyd benchmark"):
            cache = lambda sub: os.path.join(
                args.system, sub, f".ref_convs_{args.strength_measure}.json"
            ) if os.path.isdir(os.path.join(args.system, sub)) else None
            tb = compute_reference_convs(
                train, args.strength_measure, opts,
                grids=train_grids, cache_path=cache("train"),
            )
            print(f"train Lloyd benchmark conv: {tb.mean():.4f}", flush=True)
            if args.compute_test_loss:
                teb = compute_reference_convs(
                    test, args.strength_measure, opts,
                    grids=test_grids, cache_path=cache("test"),
                )
                print(f"test Lloyd benchmark conv: {teb.mean():.4f}", flush=True)
    if args.benchmark_only:
        print("benchmark-only: reference convs cached, exiting")
        return

    bf_width = dataset_bf_width(train_grids)
    start_ck = load_checkpoint(args.start_model) if args.start_model else None
    if start_ck:
        nc0 = (start_ck.get("extra") or {}).get("net_config") or {}
        bf_width = max(bf_width, int(nc0.get("bf_width", 0)))
    if start_ck:
        args.rel_strength = bool(
            ((start_ck.get("extra") or {}).get("net_config") or {})
            .get("rel_strength", args.rel_strength)
        )
    net = FullAggNet(dim=args.dim, num_conv=args.num_conv, iterations=args.iterations,
                     bf_width=bf_width, rel_strength=args.rel_strength)
    net_config = dict(dim=args.dim, num_conv=args.num_conv,
                      iterations=args.iterations, bf_width=bf_width,
                      rel_strength=args.rel_strength)
    params = net.init(jax.random.PRNGKey(0), train[0].A, train[0].k)
    if start_ck:
        params = start_ck["best_params"]
    vec, unravel, fold_ids, fold_names = flatten_params(
        params, fold_depth=args.fold_depth
    )
    print(f"{vec.shape[0]} weights in {len(fold_names)} folds")

    mesh = None
    if args.mesh_pop:
        from mlamg_tpu.parallel import make_mesh

        mesh = make_mesh(pop=args.mesh_pop, row=1)

    if args.bucketed:
        fitness = make_population_fitness_bucketed(
            net, unravel, train, train_buckets, opts,
            loss_relative=args.loss_relative_measure, mesh=mesh,
            fitness_metric=args.fitness_metric,
        )
    else:
        fitness = make_population_fitness(
            net, unravel, train, opts,
            loss_relative=args.loss_relative_measure, mesh=mesh,
            batch_size=args.batch_size if args.batched else None,
        )

    pop0 = init_population(
        jax.random.PRNGKey(1), vec, args.population_size, perturb=args.init_perturb
    )
    cfg = GAConfig(
        crossover_probability=args.crossover_prob,
        mutation_probability=args.mutation_prob,
        mutation_min_perturb=-args.mutation_perturb,
        mutation_max_perturb=args.mutation_perturb,
        steady_state_top_use=0.5,
        steady_state_bottom_discard=0.5,
        selection="greedy" if args.greedy else "steady_state",
        adaptive_sigma=args.adaptive_sigma,
        mutation_sparsity=args.mutation_sparsity,
    )
    ga = ParallelGA(pop0, fitness, cfg, fold_ids=fold_ids)
    if args.mutate_subnets:
        import re

        pats = [re.compile(p) for p in args.mutate_subnets.split(",")]
        scope = np.zeros(vec.shape[0], bool)
        for fi, name in enumerate(fold_names):
            if any(p.search(name) for p in pats):
                scope |= fold_ids == fi
        cfg.mutation_scope = scope
        print(f"mutation scope: {int(scope.sum())}/{len(scope)} weights "
              f"({args.mutate_subnets})")
    ga.num_generation = args.start_generation
    if args.resume:
        ck = load_checkpoint(args.resume)
        ga.population = np.asarray(ck["population"]).copy()
        ga.fitness = np.asarray(ck["fitness"]).copy()
        ga.computed[:] = True
        ga.key = ga._coerce_key(np.asarray(ck["key"]))
        ga.num_generation = ck["generation"]
        if "sigma" in ck:
            ga.sigma = float(ck["sigma"])
        print(f"resumed full GA state at generation {ga.num_generation}")

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    writer = MetricsWriter(args.metrics_dir)

    if not args.compute_test_loss:
        test_fitness = None
    elif args.bucketed:
        test_fitness = make_population_fitness_bucketed(
            net, unravel, test, test_buckets, opts,
            loss_relative=args.loss_relative_measure,
            fitness_metric=args.fitness_metric,
        )
    else:
        test_fitness = make_population_fitness(
            net, unravel, test, opts, loss_relative=args.loss_relative_measure
        )

    def report(final: bool = False):
        best, fit, _ = ga.best_solution()
        gen = ga.num_generation
        train_loss = 1.0 / fit
        do_test = test_fitness is not None and (
            final or gen % args.test_loss_every == 0
        )
        do_ckpt = final or gen % args.checkpoint_every == 0
        st = ga.last_stats
        diag = (
            f"  [sigma {st['sigma']:.4g} accept {st['accept_rate']:.2f} "
            f"off {st['offspring_mean']:.4f}+-{st['offspring_std']:.4f} "
            f"best {st['offspring_best']:.4f}]"
            if st else ""
        )
        if do_test:
            t_fit = float(test_fitness(jnp.asarray(best)[None, :], gen)[0])
            test_loss = 1.0 / t_fit
            writer.add_scalars("Loss/Test", {"ML": test_loss, "Lloyd": 1.0}, gen)
            print(f"Generation = {gen}  Train Loss = {train_loss:.6f}  "
                  f"Test Loss = {test_loss:.6f}{diag}", flush=True)
        else:
            print(f"Generation = {gen}  Train Loss = {train_loss:.6f}{diag}",
                  flush=True)
        if st:
            writer.add_scalars(
                "GA/Offspring",
                {k: float(v) for k, v in st.items()},
                gen,
            )
        writer.add_scalars("Loss/Train", {"ML": train_loss, "Lloyd": 1.0}, gen)
        writer.add_scalars(
            "PopulationFitness",
            {str(i): float(f) for i, f in enumerate(np.sort(np.asarray(ga.fitness)))},
            gen,
        )
        if do_ckpt:
            save_checkpoint(
                os.path.join(args.checkpoint_dir, f"model_{gen:03}.ckpt"),
                generation=gen,
                best_params=unravel(jnp.asarray(best)),
                population=ga.population,
                fitness=ga.fitness,
                key=ga.key,
                sigma=ga.sigma,
                extra=dict(net_config=net_config),
            )

    report()
    for _ in range(args.max_generations):
        with Profiler("generation"):
            if args.batched:
                ga.stochastic_iteration()
            else:
                ga.iteration()
        report(final=_ == args.max_generations - 1)
    Profiler.print_tree()
    writer.close()


if __name__ == "__main__":
    main()
