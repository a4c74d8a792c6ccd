"""Visualization CLI (consolidates the reference's plot/stat scripts:
utils/visualize_grid.py, utils/gen_dataset_plots.py,
utils/dataset_size_hist.py, utils/visualize_model_error.py,
utils/visualize_model_passes.py).

    python -m mlamg_tpu.cli.visualize grid path/to/g.grid --out g.png
    python -m mlamg_tpu.cli.visualize aggregates g.grid --model ckpt --out agg.png
    python -m mlamg_tpu.cli.visualize dataset-stats data_dir --out hist.png
    python -m mlamg_tpu.cli.visualize eval-results eval.pkl --out scatter.png
    python -m mlamg_tpu.cli.visualize model-error g.grid --model ckpt --out err.png
    python -m mlamg_tpu.cli.visualize model-passes g.grid --model ckpt --out passes.png
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def cmd_grid(args):
    from mlamg_tpu.data import Grid
    from mlamg_tpu.viz import plot_grid

    plt = _plt()
    g = Grid.load(args.path)
    plt.figure(figsize=(7, 7))
    plot_grid(g)
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def _model_forward(args, g):
    import jax
    import jax.numpy as jnp
    from mlamg_tpu.models import FullAggNet
    from mlamg_tpu.train import GridBundle
    from mlamg_tpu.utils import load_checkpoint

    b = GridBundle.from_grid(g, args.alpha)
    net = FullAggNet(dim=args.dim, num_conv=2, iterations=2)
    if args.model:
        params = load_checkpoint(args.model)["best_params"]
    else:
        params = net.init(jax.random.PRNGKey(0), b.A, b.k)
    return net, params, b


def cmd_aggregates(args):
    from mlamg_tpu.data import Grid
    from mlamg_tpu.viz import plot_agg, plot_spider_agg, plot_agg_3d

    plt = _plt()
    g = Grid.load(args.path)
    net, params, b = _model_forward(args, g)
    agg_id, P, C, centers, scores = net.apply(params, b.A, b.k)
    plt.figure(figsize=(7, 7))
    if g.x is not None and g.x.shape[1] >= 3 and np.ptp(g.x[:, 2]) > 0:
        plot_agg_3d(g, np.asarray(agg_id))
    else:
        plot_agg(g, np.asarray(agg_id))
        plot_spider_agg(g, np.asarray(agg_id), np.asarray(P.todense()))
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def cmd_dataset_stats(args):
    from mlamg_tpu.data import Grid

    plt = _plt()
    grids = Grid.load_dir(args.path)
    sizes = [g.n for g in grids]
    nnzs = [g.A.nnz for g in grids]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(sizes, bins=30)
    axes[0].set_xlabel("n (dofs)")
    axes[1].hist(nnzs, bins=30)
    axes[1].set_xlabel("nnz")
    fig.suptitle(f"{len(grids)} grids")
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}: n in [{min(sizes)}, {max(sizes)}]")


def cmd_eval_results(args):
    plt = _plt()
    with open(args.path, "rb") as f:
        res = pickle.load(f)
    fig, ax = plt.subplots(figsize=(6, 6))
    base = res.get("lloyd")
    for name in ("ml", "random"):
        if name in res:
            ax.scatter(base, res[name], s=14, label=f"{name} vs lloyd")
    lim = [0, max(1.0, float(np.max(base)))]
    ax.plot(lim, lim, "k--", lw=1)
    ax.set_xlabel("lloyd conv factor")
    ax.set_ylabel("other conv factor")
    ax.legend()
    means = {k: float(np.mean(v)) for k, v in res.items() if isinstance(v, np.ndarray)}
    ax.set_title(" ".join(f"{k}={v:.3f}" for k, v in means.items()))
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}; means: {means}")


def cmd_model_error(args):
    """Error modes left after k two-level cycles with the model's P
    (role of utils/visualize_model_error.py)."""
    import jax.numpy as jnp
    from mlamg_tpu.data import Grid
    from mlamg_tpu.mg import twolevel_solve

    plt = _plt()
    g = Grid.load(args.path)
    net, params, b = _model_forward(args, g)
    agg_id, P, *_ = net.apply(params, b.A, b.k)
    x, conv, err, iters = twolevel_solve(
        b.A, P, jnp.zeros(g.n), b.x0, res_tol=0.0, max_iter=args.cycles
    )
    e = np.asarray(x)
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(g.x[:, 0], g.x[:, 1], c=e, cmap="RdBu", s=25)
    fig.colorbar(sc)
    ax.set_title(f"error after {args.cycles} cycles (conv={float(conv):.3f})")
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def cmd_model_passes(args):
    """Per-iteration top-k picks of the AggNet stack
    (role of utils/visualize_model_passes.py)."""
    import jax
    from mlamg_tpu.data import Grid
    from mlamg_tpu.models import graph_from_matrix_basic

    plt = _plt()
    g = Grid.load(args.path)
    net, params, b = _model_forward(args, g)
    gd = graph_from_matrix_basic(b.A)

    agg_module = net.bind(params)
    masks = [np.asarray(m) for m in agg_module.AggNetM(gd, b.k, return_intermediate=True)]
    fig, axes = plt.subplots(1, len(masks), figsize=(6 * len(masks), 6), squeeze=False)
    for ax, m in zip(axes[0], masks):
        ax.scatter(g.x[:, 0], g.x[:, 1], c="0.8", s=15)
        sel = m > 0.5
        ax.scatter(g.x[sel, 0], g.x[sel, 1], c="r", s=35)
    plt.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Visualization utilities")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("grid", cmd_grid),
        ("aggregates", cmd_aggregates),
        ("dataset-stats", cmd_dataset_stats),
        ("eval-results", cmd_eval_results),
        ("model-error", cmd_model_error),
        ("model-passes", cmd_model_passes),
    ]:
        sp = sub.add_parser(name)
        sp.add_argument("path")
        sp.add_argument("--out", default=f"{name}.png")
        sp.add_argument("--model", default=None)
        sp.add_argument("--alpha", type=float, default=0.1)
        sp.add_argument("--dim", type=int, default=8)
        sp.add_argument("--cycles", type=int, default=10)
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
