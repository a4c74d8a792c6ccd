"""Pytree <-> chromosome codec with fold structure.

Role of ns/ga/torch.py:8-112 (state_dict flattening with fold index ranges):
a Flax param pytree flattens to one (W,) vector, and every weight gets an
integer *fold id* (by default, the top-level module it belongs to).  Where
the reference tracks folds as lists of index ranges and loops over them
(ns/lib/range.py), here the fold id array drives fully vectorized fold-wise
crossover and mutation: a per-fold coin flip expands to a per-weight mask by
a single gather (``fold_coin[fold_ids]``) — no loops, batchable over whole
populations.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def flatten_params(params, fold_depth: int = 2):
    """Flatten a param pytree.

    Returns (vec, unravel, fold_ids, fold_names):
    vec       : (W,) float vector
    unravel   : vec -> pytree
    fold_ids  : (W,) int32 fold assignment per weight
    fold_names: list of fold names (index = fold id)

    ``fold_depth`` controls how many levels of the pytree path define a fold
    (depth 2 groups by sub-module under the top-level 'params' collection —
    e.g. PNet / AggNetM / CNet, matching the reference's module folds).
    """
    vec, unravel = ravel_pytree(params)

    leaves_with_paths = jax.tree_util.tree_leaves_with_path(params)
    fold_names: list[str] = []
    fold_index: dict[str, int] = {}
    ids = np.empty(int(vec.shape[0]), dtype=np.int32)
    pos = 0
    for path, leaf in leaves_with_paths:
        keys = [getattr(p, "key", getattr(p, "idx", str(p))) for p in path]
        name = "/".join(str(k) for k in keys[:fold_depth])
        if name not in fold_index:
            fold_index[name] = len(fold_names)
            fold_names.append(name)
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        ids[pos : pos + size] = fold_index[name]
        pos += size
    assert pos == ids.shape[0]
    return vec, unravel, jnp.asarray(ids), fold_names


def init_population(key, vec: jax.Array, pop_size: int, perturb: float = 1.0):
    """(P, W) population: row 0 = the seed weights, the rest uniformly
    perturbed copies (reference ns/ga/torch.py:97-111)."""
    W = vec.shape[0]
    noise = jax.random.uniform(
        key, (pop_size - 1, W), vec.dtype, minval=-perturb, maxval=perturb
    )
    return jnp.concatenate([vec[None, :], vec[None, :] + noise], axis=0)
