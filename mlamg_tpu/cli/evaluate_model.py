"""Single-grid model evaluation with aggregate statistics
(role of utils/evaluate_model.py; plotting is optional/host-side).

    python -m mlamg_tpu.cli.evaluate_model grid.grid --model ckpt.ckpt
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
    args = p.parse_args(argv)

    g = Grid.load(args.grid)
    opts = SolveOptions(res_tol=args.res_tol)
    b = GridBundle.from_grid(g, args.alpha)
    print(f"n={g.n} nnz={g.A.nnz} k={b.k}")
    print(f"lloyd conv:  {lloyd_reference_conv(b, 'abs', opts):.4f}")
    print(f"random conv: {random_reference_conv(b, opts=opts):.4f}")

    if args.model:
        net = FullAggNet(dim=args.dim, num_conv=args.num_conv, iterations=args.iterations)
        params = load_checkpoint(args.model)["best_params"]
        agg_id, P, C, centers, scores = net.apply(params, b.A, b.k)
        conv = float(measured_conv(b.A, P, b.x0, opts))
        connected = bool(check_aggregates_connected(b.A, agg_id, b.k))
        sizes = np.bincount(np.asarray(agg_id), minlength=b.k)
        print(f"ml conv:     {conv:.4f}")
        print(f"aggregates connected: {connected}; sizes min/mean/max = "
              f"{sizes.min()}/{sizes.mean():.1f}/{sizes.max()}")


if __name__ == "__main__":
    main()
