"""Dataset-level evaluation: ML vs Lloyd vs random baselines
(role of utils/evaluate_dataset.py).

    python -m mlamg_tpu.cli.evaluate_dataset data/2d_iso --model ckpt.ckpt
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import dataset_bf_width, parse_bool_str
from mlamg_tpu.data import Grid
from mlamg_tpu.graph.strength import STRENGTH_MEASURES
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.train import (
    GridBundle,
    SolveOptions,
    lloyd_reference_conv,
    random_reference_conv,
    evaluate_model_on_bundles,
)
from mlamg_tpu.utils import load_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate ML/Lloyd/random AMG on a dataset")
    p.add_argument("system", type=str)
    p.add_argument("--model", type=str, default=None, help="checkpoint file")
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--strength-measure", default="olson", choices=STRENGTH_MEASURES,
                   help="reference's published Lloyd/dumb baselines use olson "
                        "(utils/evaluate_dataset.py:76,84)")
    p.add_argument("--res-tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=300)
    p.add_argument("--smoother", default="multicolor_gs",
                   choices=["jacobi", "multicolor_gs", "chebyshev"],
                   help="reference amg_2_v smooths with Gauss-Seidel; "
                        "multicolor_gs is the parallel equivalent")
    p.add_argument("--float64", type=parse_bool_str, default=False)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--num-conv", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--out", type=str, default="data_out")
    p.add_argument("--ablations", type=parse_bool_str, default=False,
                   help="also evaluate ML-aggregation-only and "
                        "ML-interpolation-only (reference tex/6_1_22 table)")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--compile-cache", type=str, default=None)
    args = p.parse_args(argv)
    from mlamg_tpu.cli.common import force_platform

    force_platform(args.platform)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.float64 if args.float64 else jnp.float32
    if args.float64:
        jax.config.update("jax_enable_x64", True)
    opts = SolveOptions(res_tol=args.res_tol, max_iter=args.max_iter,
                        smoother=args.smoother)
    grids = Grid.load_dir(args.system)
    bundles = [GridBundle.from_grid(g, args.alpha, dtype) for g in grids]
    print(f"{len(bundles)} grids")

    results = {"alpha": args.alpha, "system": args.system}
    t = time.time()
    results["lloyd"] = np.asarray(
        [lloyd_reference_conv(b, args.strength_measure, opts) for b in bundles]
    )
    print(f"lloyd:  mean conv {results['lloyd'].mean():.4f} ({time.time()-t:.1f}s)")
    t = time.time()
    results["random"] = np.asarray(
        [random_reference_conv(b, opts=opts, strength_kind=args.strength_measure)
         for b in bundles]
    )
    print(f"random: mean conv {results['random'].mean():.4f} ({time.time()-t:.1f}s)")

    if args.model:
        ck = load_checkpoint(args.model)
        nc = (ck.get("extra") or {}).get("net_config") or {}
        # the BF width is part of the trained forward; a width re-derived
        # from the eval split alone can silently differ from the training
        # width (e.g. 2d_iso: train 11 vs test 10) and change every learned
        # conv factor.  Prefer the checkpoint's width; it must still cover
        # the eval split's degrees.
        width = max(int(nc.get("bf_width", 0)), dataset_bf_width(grids))
        net = FullAggNet(
            dim=int(nc.get("dim", args.dim)),
            num_conv=int(nc.get("num_conv", args.num_conv)),
            iterations=int(nc.get("iterations", args.iterations)),
            bf_width=width,
            rel_strength=bool(nc.get("rel_strength", False)),
        )
        if nc:
            print(f"net config from checkpoint: {nc} (bf_width used: {width})")
        params = ck["best_params"]
        t = time.time()
        results["ml"] = evaluate_model_on_bundles(net, params, bundles, opts)
        print(f"ml:     mean conv {results['ml'].mean():.4f} ({time.time()-t:.1f}s)")

        if args.ablations:
            from functools import partial
            from mlamg_tpu.train import measured_conv
            from mlamg_tpu.graph.lloyd import lloyd_aggregation
            from mlamg_tpu.graph.strength import strength_measure
            from mlamg_tpu.mg.interp import sa_interpolation_dense

            @partial(jax.jit, static_argnames=("k", "width", "num_colors"))
            def agg_only_conv(params, A, x0, colors, k, width, num_colors):
                agg_id = net.apply(params, A, k, method="agg_only")
                P = sa_interpolation_dense(A, agg_id, k)
                return measured_conv(A, P, x0, opts, colors=colors,
                                     num_colors=num_colors)

            @partial(jax.jit, static_argnames=("k", "width", "num_colors"))
            def int_only_conv(params, A, x0, colors, k, width, num_colors):
                C = strength_measure(A, args.strength_measure, width=width)
                from mlamg_tpu.graph.lloyd import _lloyd_core

                seeds = jax.random.permutation(jax.random.PRNGKey(0), A.shape[0])[:k]
                agg_id, _ = _lloyd_core(C, seeds.astype(jnp.int32), 10)
                P = net.apply(params, A, agg_id, k, method="int_only")
                return measured_conv(A, P, x0, opts, colors=colors,
                                     num_colors=num_colors)

            t = time.time()
            results["ml_agg_only"] = np.asarray(
                [float(agg_only_conv(params, b.A, b.x0, b.colors, b.k,
                                     b.width, b.num_colors)) for b in bundles]
            )
            print(f"ml-agg: mean conv {results['ml_agg_only'].mean():.4f} "
                  f"({time.time()-t:.1f}s)")
            t = time.time()
            results["ml_int_only"] = np.asarray(
                [float(int_only_conv(params, b.A, b.x0, b.colors, b.k,
                                     b.width, b.num_colors)) for b in bundles]
            )
            print(f"ml-int: mean conv {results['ml_int_only'].mean():.4f} "
                  f"({time.time()-t:.1f}s)")

    os.makedirs(args.out, exist_ok=True)
    name = os.path.basename(os.path.normpath(args.system))
    out_path = os.path.join(args.out, f"eval_{name}_alpha{args.alpha}.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(results, f)
    # JSON summary next to the pickle (means; machine-checkable artifact)
    import json

    summary = {
        k: float(np.mean(v)) for k, v in results.items()
        if isinstance(v, np.ndarray)
    }
    summary.update({"n_grids": len(bundles), "system": args.system,
                    "alpha": args.alpha, "model": args.model or ""})
    json_path = out_path.replace(".pkl", ".json")
    with open(json_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"saved {out_path} and {json_path}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
