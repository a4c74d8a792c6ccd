"""Shared CLI helpers (role of utils/common.py)."""

from __future__ import annotations

import argparse

import numpy as np
import jax

from mlamg_tpu.data import Grid
from mlamg_tpu.graph.strength import STRENGTH_MEASURES
from mlamg_tpu.train import GridBundle, SolveOptions, lloyd_reference_conv


def parse_bool_str(v: str) -> bool:
    return str(v).lower() in ("t", "true", "1", "yes")


def force_platform(platform: str | None):
    """Pin the jax backend. The sandbox sitecustomize may have imported jax
    with an ambient JAX_PLATFORMS; env vars are too late by CLI main() time,
    so use jax.config (effective until the backend is first used)."""
    if platform:
        jax.config.update("jax_platforms", platform)


def dataset_bf_width(grids) -> int:
    """Static max row/column degree across a dataset's matrices — enables
    the gather-only pull-mode Bellman-Ford + ELL message aggregation in the
    model forward (graph/bellman_ford.py, models/graphdata.py).  A width
    larger than any degree is safe (spare slots are inert).

    The pull-BF / in-ELL scheme buckets edges by *destination* (needs the
    max in/column degree) and assumes a symmetric sparsity pattern; both
    are validated here so an unsuitable dataset errors at setup instead of
    silently dropping edges downstream.
    """
    import scipy.sparse as sp

    w = 1
    for i, g in enumerate(grids):
        A = sp.csr_matrix(g.A)
        pat = A.copy()
        pat.data = np.ones_like(pat.data)
        if (pat != pat.T).nnz != 0:
            name = (g.extra or {}).get("filename", f"grid {i}")
            raise ValueError(
                f"{name}: sparsity pattern is not symmetric — the pull-mode "
                "Bellman-Ford / ELL message aggregation requires a symmetric "
                "pattern (symmetrize the matrix pattern or use the push-mode "
                "model with bf_width=None)"
            )
        row_deg = int(np.diff(A.indptr).max())
        col_deg = int(np.diff(A.tocsc().indptr).max())
        w = max(w, row_deg, col_deg)
    return w


def load_dataset_grids(system: str):
    """Load raw train/test Grids from .grid dirs
    (reference train_dataset.py:62-69)."""
    import os

    train_dir = os.path.join(system, "train")
    test_dir = os.path.join(system, "test")
    if not (os.path.exists(train_dir) and os.path.exists(test_dir)):
        train_dir = test_dir = system
    return Grid.load_dir(train_dir), Grid.load_dir(test_dir)


def load_dataset(system: str, alpha: float, dtype):
    """Load train/test .grid dirs as GridBundles."""
    train, test = load_dataset_grids(system)
    return (
        [GridBundle.from_grid(g, alpha, dtype) for g in train],
        [GridBundle.from_grid(g, alpha, dtype) for g in test],
    )


def compute_reference_convs(bundles, strength_measure: str, opts: SolveOptions,
                            grids=None, cache_path: str | None = None):
    """Lloyd benchmark per grid (role of compute_ref_loss,
    train_dataset.py:164-167).

    With ``cache_path`` (and ``grids`` supplying filenames), per-grid convs
    are memoized on disk keyed by the measurement settings — the benchmark
    compiles one XLA program per distinct grid shape, so recomputing it on
    every restart is the single most expensive (and, through the TPU
    tunnel, least reliable) part of training startup.
    """
    import json
    import os

    settings = {
        "strength": strength_measure,
        "res_tol": opts.res_tol,
        "max_iter": opts.max_iter,
        "pre": opts.pre_smooth,
        "post": opts.post_smooth,
        "smoother": opts.smoother,
        "error_norm": opts.use_error_norm,
        "singular": opts.singular,
    }
    cache = {}
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                payload = json.load(f)
            if payload.get("settings") == settings:
                cache = payload.get("convs", {})
        except Exception:
            cache = {}

    def grid_key(i):
        if grids is None:
            return None
        fname = (grids[i].extra or {}).get("filename", "")
        return os.path.basename(fname) if fname else None

    dirty = False
    for i, b in enumerate(bundles):
        key = grid_key(i)
        if key is not None and key in cache:
            b.ref_conv = cache[key]
            continue
        b.ref_conv = max(lloyd_reference_conv(b, strength_measure, opts), 1e-6)
        if key is not None:
            cache[key] = b.ref_conv
            dirty = True
    if cache_path and dirty:
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"settings": settings, "convs": cache}, f)
        os.replace(tmp, cache_path)
    return np.asarray([b.ref_conv for b in bundles])


def add_training_args(parser: argparse.ArgumentParser):
    parser.add_argument("system", type=str, help="Problem folder with .grid files")
    parser.add_argument("--max-generations", type=int, default=500)
    parser.add_argument("--population-size", type=int, default=20)
    parser.add_argument("--alpha", type=float, default=0.1, help="coarsening ratio")
    parser.add_argument("--start-generation", type=int, default=0)
    parser.add_argument("--start-model", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to restore FULL GA state from "
                             "(population + fitness + key + generation); "
                             "--start-model only reseeds around best_params")
    parser.add_argument("--benchmark-only", action="store_true",
                        help="compute + cache the Lloyd benchmark, then exit "
                             "(run this on CPU once so the TPU process never "
                             "compiles the per-grid benchmark programs)")
    parser.add_argument("--strength-measure", default="olson",
                        choices=STRENGTH_MEASURES,
                        help="strength for the Lloyd benchmark; the "
                             "reference's published baselines use 'olson' "
                             "(utils/evaluate_dataset.py:76)")
    parser.add_argument("--greedy", default=False, type=parse_bool_str)
    parser.add_argument("--batched", default=False, type=parse_bool_str)
    parser.add_argument("--compute-test-loss", default=True, type=parse_bool_str)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--loss-relative-measure", type=parse_bool_str, default=True)
    parser.add_argument("--fitness-metric", default="mean_ratio",
                        choices=["mean_ratio", "ratio_of_means"],
                        help="mean_ratio = reference trainer fitness "
                             "(1/mean(conv/ref)); ratio_of_means = the "
                             "published-table protocol mean(conv)/mean(ref)")
    parser.add_argument("--adaptive-sigma", type=parse_bool_str, default=False,
                        help="mutation scale follows the 1/5-success rule "
                             "(fixes the fixed-perturbation stall near optima)")
    parser.add_argument("--mutate-subnets", type=str, default=None,
                        help="comma-separated regexes of fold names; only "
                             "matching subnets' weights mutate (e.g. "
                             "'AggNet,CNet' to search aggregation only)")
    parser.add_argument("--mutation-sparsity", type=float, default=None,
                        help="per-weight mutation probability instead of "
                             "fold-wise masks")
    parser.add_argument("--evaluate-bench-loss", type=parse_bool_str, default=True)
    parser.add_argument("--pre-smooth", type=int, default=1)
    parser.add_argument("--post-smooth", type=int, default=1)
    parser.add_argument("--res-tol", type=float, default=1e-6)
    parser.add_argument("--max-iter", type=int, default=300)
    parser.add_argument("--smoother", default="multicolor_gs",
                        choices=["jacobi", "multicolor_gs", "chebyshev"],
                        help="two-level smoother inside the fitness measure; "
                             "multicolor_gs matches the reference amg_2_v's "
                             "Gauss-Seidel (ns/lib/multigrid.py:175)")
    parser.add_argument("--error-norm", type=parse_bool_str, default=True,
                        help="stop on ||x|| (error norm, b=0) like the "
                             "reference trainer (error_tol=1e-6, "
                             "utils/train_dataset.py:114)")
    parser.add_argument("--dim", type=int, default=8, help="model hidden dim")
    parser.add_argument("--num-conv", type=int, default=2)
    parser.add_argument("--iterations", type=int, default=2)
    parser.add_argument("--rel-strength", type=parse_bool_str, default=False,
                        help="row-normalized strength edge feature for "
                             "AggNet/CNet (scale-invariant anisotropy "
                             "signal; changes parameter shapes)")
    parser.add_argument("--bucketed", type=parse_bool_str, default=True,
                        help="evaluate fitness as one program per shape bucket "
                             "instead of one per grid")
    parser.add_argument("--bucket-step", type=int, default=64,
                        help="grids are padded to n rounded up to this step")
    parser.add_argument("--mesh-pop", type=int, default=0,
                        help="shard population fitness over this many devices (0 = no mesh)")
    parser.add_argument("--init-perturb", type=float, default=0.5,
                        help="uniform perturbation when seeding the population")
    parser.add_argument("--mutation-prob", type=float, default=1.0,
                        help="per-fold mutation probability")
    parser.add_argument("--fold-depth", type=int, default=2,
                        help="pytree depth defining GA folds (2 = per-subnet, "
                             "large = per-tensor like the reference state_dict)")
    parser.add_argument("--mutation-perturb", type=float, default=0.5,
                        help="uniform mutation magnitude")
    parser.add_argument("--crossover-prob", type=float, default=0.0)
    parser.add_argument("--checkpoint-dir", type=str, default="models_chkpt")
    parser.add_argument("--float64", default=False, type=parse_bool_str)
    parser.add_argument("--test-loss-every", type=int, default=10,
                        help="evaluate the test set every N generations")
    parser.add_argument("--checkpoint-every", type=int, default=10,
                        help="write a checkpoint every N generations")
    parser.add_argument("--metrics-dir", type=str, default="runs")
    parser.add_argument("--platform", type=str, default=None,
                        choices=[None, "cpu", "tpu"],
                        help="pin the jax backend (default: ambient)")
    parser.add_argument("--compile-cache", type=str, default=None,
                        help="persistent XLA compilation cache directory")
    return parser
