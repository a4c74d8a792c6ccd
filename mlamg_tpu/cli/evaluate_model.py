"""Single-grid model evaluation with aggregate statistics and comparison
plots (role of utils/evaluate_model.py:144-248 — spider plots of ML vs
Lloyd vs random aggregates annotated with their convergence factors).

    python -m mlamg_tpu.cli.evaluate_model grid.grid --model ckpt.ckpt \
        --plot out.png
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.data import Grid
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.train import GridBundle, SolveOptions, lloyd_reference_conv, random_reference_conv, measured_conv
from mlamg_tpu.graph import check_aggregates_connected
from mlamg_tpu.utils import load_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate one grid: ML vs Lloyd vs random")
    p.add_argument("grid", type=str)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--num-conv", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--res-tol", type=float, default=1e-6)
    p.add_argument("--plot", type=str, default=None,
                   help="write a Lloyd-vs-ML aggregate comparison figure here")
    p.add_argument("--spider", action="store_true",
                   help="spider plots (P-weighted) instead of blob plots")
    args = p.parse_args(argv)

    g = Grid.load(args.grid)
    opts = SolveOptions(res_tol=args.res_tol)
    b = GridBundle.from_grid(g, args.alpha)
    print(f"n={g.n} nnz={g.A.nnz} k={b.k}")

    from mlamg_tpu.graph.lloyd import lloyd_aggregation
    from mlamg_tpu.graph.strength import strength_measure
    from mlamg_tpu.mg.interp import sa_interpolation_dense

    C = strength_measure(b.A, "abs", width=b.width)
    lloyd_agg, _, _ = lloyd_aggregation(C, ratio=args.alpha, key=jax.random.PRNGKey(0))
    lloyd_conv = lloyd_reference_conv(b, "abs", opts)
    print(f"lloyd conv:  {lloyd_conv:.4f}")
    print(f"random conv: {random_reference_conv(b, opts=opts):.4f}")

    ml = None
    if args.model:
        ck = load_checkpoint(args.model)
        nc = (ck.get("extra") or {}).get("net_config") or {}
        kw = dict(dim=int(nc.get("dim", args.dim)),
                  num_conv=int(nc.get("num_conv", args.num_conv)),
                  iterations=int(nc.get("iterations", args.iterations)),
                  rel_strength=bool(nc.get("rel_strength", False)))
        if nc.get("bf_width"):
            kw["bf_width"] = max(int(nc["bf_width"]), b.width)
        net = FullAggNet(**kw)
        params = ck["best_params"]
        agg_id, P, C_ml, centers, scores = net.apply(params, b.A, b.k)
        conv = float(measured_conv(b.A, P, b.x0, opts))
        connected = bool(check_aggregates_connected(b.A, agg_id, b.k))
        sizes = np.bincount(np.asarray(agg_id), minlength=b.k)
        print(f"ml conv:     {conv:.4f}")
        print(f"aggregates connected: {connected}; sizes min/mean/max = "
              f"{sizes.min()}/{sizes.mean():.1f}/{sizes.max()}")
        ml = (agg_id, P, conv)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from mlamg_tpu.viz.aggplot import plot_agg, plot_spider_agg

        ncols = 2 if ml is not None else 1
        fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 5.5), squeeze=False)
        draw = plot_spider_agg if args.spider else plot_agg
        draw(g, lloyd_agg, ax=axes[0, 0])
        axes[0, 0].set_title(f"Lloyd + SA  (conv {float(lloyd_conv):.4f})")
        if ml is not None:
            agg_id, P, conv = ml
            if args.spider:
                draw(g, agg_id, P=P, ax=axes[0, 1])
            else:
                draw(g, agg_id, ax=axes[0, 1])
            axes[0, 1].set_title(f"ML (FullAggNet)  (conv {conv:.4f})")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
