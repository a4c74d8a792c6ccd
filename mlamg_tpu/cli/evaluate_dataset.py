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

from mlamg_tpu.cli.common import parse_bool_str
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
    p.add_argument("--strength-measure", default="abs", choices=STRENGTH_MEASURES)
    p.add_argument("--res-tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=300)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--num-conv", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--out", type=str, default="data_out")
    args = p.parse_args(argv)

    opts = SolveOptions(res_tol=args.res_tol, max_iter=args.max_iter)
    grids = Grid.load_dir(args.system)
    bundles = [GridBundle.from_grid(g, args.alpha) for g in grids]
    print(f"{len(bundles)} grids")

    results = {"alpha": args.alpha, "system": args.system}
    t = time.time()
    results["lloyd"] = np.asarray(
        [lloyd_reference_conv(b, args.strength_measure, opts) for b in bundles]
    )
    print(f"lloyd:  mean conv {results['lloyd'].mean():.4f} ({time.time()-t:.1f}s)")
    t = time.time()
    results["random"] = np.asarray([random_reference_conv(b, opts=opts) for b in bundles])
    print(f"random: mean conv {results['random'].mean():.4f} ({time.time()-t:.1f}s)")

    if args.model:
        net = FullAggNet(dim=args.dim, num_conv=args.num_conv, iterations=args.iterations)
        params = load_checkpoint(args.model)["best_params"]
        t = time.time()
        results["ml"] = evaluate_model_on_bundles(net, params, bundles, opts)
        print(f"ml:     mean conv {results['ml'].mean():.4f} ({time.time()-t:.1f}s)")

    os.makedirs(args.out, exist_ok=True)
    name = os.path.basename(os.path.normpath(args.system))
    out_path = os.path.join(args.out, f"eval_{name}_alpha{args.alpha}.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(results, f)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
