"""Lloyd aggregation (graph k-means) — jitted, replaces pyamg's C++
``lloyd_cluster`` path used by the reference (ns/lib/graph.py:156-239).

Algorithm (Bell, "AMG for discrete differential forms", Alg. 6.3): alternate

1. assign every node to its nearest seed via multi-source Bellman-Ford;
2. move each seed to the *most interior* node of its cluster — the node
   furthest from the cluster boundary, computed by a second multi-source
   Bellman-Ford from all boundary nodes.

Each step is segment-reduction work with static shapes; the iteration count
is a static ``maxiter`` (pyamg default 10 / reference ratio call sites use
their default).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mlamg_tpu.graph.bellman_ford import bellman_ford, nearest_center_to_agg
from mlamg_tpu.ops.sparse import CSR


def _segment_argmax(values: jax.Array, seg: jax.Array, node_id: jax.Array, k: int):
    """Per-segment argmax with min-node-id tie-break. Sentinel-safe."""
    best = jax.ops.segment_max(values, seg, num_segments=k)
    is_best = values >= best[jnp.minimum(seg, k - 1)]
    winner = jax.ops.segment_min(
        jnp.where(is_best, node_id, node_id.shape[0]), seg, num_segments=k
    )
    return winner


def lloyd_iteration(C, seeds: jax.Array):
    """One Lloyd step: (BF assign, recenter). Returns (new_seeds, agg_id)."""
    n = C.shape[0]
    k = seeds.shape[0]
    node_id = jnp.arange(n, dtype=jnp.int32)

    dist, nearest = bellman_ford(C, seeds)
    agg_id = nearest_center_to_agg(seeds, nearest)

    # Boundary nodes: incident to an inter-cluster edge.
    live = C.row < n
    r = jnp.minimum(C.row, n - 1)
    cross = live & (agg_id[r] != agg_id[C.col])
    is_boundary = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(cross, r, n)].set(1, mode="drop")
        .at[jnp.where(cross, C.col, n)].set(1, mode="drop")
    ) > 0
    boundary = jnp.where(is_boundary, node_id, n)

    # Distance-from-boundary via BF with all boundary nodes as sources.
    # bellman_ford takes explicit center ids; emulate multi-source with a
    # dense mask variant: dist0 = 0 on boundary.
    interior_dist, _ = _bf_from_mask(C, is_boundary)
    # If a cluster has no boundary (isolated component), every distance is
    # inf; fall back to distance-from-seed eccentricity there.
    vals = jnp.where(jnp.isinf(interior_dist), dist, interior_dist)
    seg = jnp.minimum(agg_id, k - 1)
    new_seeds = _segment_argmax(vals, seg, node_id, k)
    # Clusters that somehow lost all nodes keep their old seed.
    new_seeds = jnp.where(new_seeds >= n, seeds, new_seeds).astype(jnp.int32)
    return new_seeds, agg_id


def _bf_from_mask(C, source_mask: jax.Array, max_iter: int | None = None):
    """Bellman-Ford distances from the set ``{i : source_mask[i]}``."""
    n = C.shape[0]
    if max_iter is None:
        max_iter = n
    live = C.row < n
    w = jnp.where(live, C.data, jnp.inf)
    r = jnp.minimum(C.row, n - 1)
    c = C.col

    dist0 = jnp.where(source_mask, 0.0, jnp.inf).astype(C.data.dtype)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        dist, _, it = state
        # undirected relaxation: push both ways
        fwd = jax.ops.segment_min(dist[r] + w, c, num_segments=n)
        bwd = jax.ops.segment_min(dist[c] + w, r, num_segments=n)
        new = jnp.minimum(dist, jnp.minimum(fwd, bwd))
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = jax.lax.while_loop(cond, body, (dist0, jnp.bool_(True), 0))
    return dist, None


@partial(jax.jit, static_argnames=("maxiter",))
def _lloyd_core(C, seeds, maxiter: int):
    n = C.shape[0]

    def body(_, carry):
        seeds, _ = carry
        return lloyd_iteration(C, seeds)

    seeds, _ = jax.lax.fori_loop(
        0, maxiter, body, (seeds, jnp.zeros((n,), jnp.int32))
    )
    _, nearest = bellman_ford(C, seeds)
    agg_id = nearest_center_to_agg(seeds, nearest)
    return agg_id, seeds


def lloyd_distance(C, distance: str = "same"):
    """Edge-distance transform menu of the reference's ``lloyd_aggregation``
    (ns/lib/graph.py:186-213): for each stored C[i,j],

        'unit'  G[i,j] = 1
        'abs'   G[i,j] = |C[i,j]|
        'inv'   G[i,j] = 1 / |C[i,j]|
        'same'  G[i,j] = C[i,j]
        'sub'   G[i,j] = C[i,j] - min(C)   (the reference's 'min' branch)
    """
    live = C.mask
    if distance == "unit":
        data = jnp.where(live, 1.0, 0.0)
    elif distance == "abs":
        data = jnp.abs(C.data)
    elif distance == "inv":
        data = jnp.where(live, 1.0 / jnp.maximum(jnp.abs(C.data), 1e-30), 0.0)
    elif distance == "same":
        return C
    elif distance == "sub":
        cmin = jnp.min(jnp.where(live, C.data, jnp.inf))
        data = jnp.where(live, C.data - cmin, 0.0)
    else:
        raise ValueError(f"unrecognized distance={distance}")
    return C.with_data(data)


LLOYD_DISTANCES = ("unit", "abs", "inv", "same", "sub")


def lloyd_aggregation(C, ratio: float = 0.03, maxiter: int = 10, seeds=None, key=None,
                      distance: str = "same"):
    """Aggregate nodes by Lloyd clustering on the weighted graph ``C``.

    Parameters mirror the reference's ``lloyd_aggregation``
    (ns/lib/graph.py:156-239): ``ratio`` picks ``k = ceil(ratio*n)`` seeds
    (random permutation unless ``seeds`` given); ``distance`` transforms
    ``C.data`` into edge distances per :func:`lloyd_distance`.

    Returns (agg_id, roots, seeds): assignment vector, final centers,
    initial seeds.
    """
    C = lloyd_distance(C, distance)
    n = C.shape[0]
    k = int(np.ceil(ratio * n))
    if seeds is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        seeds = jax.random.permutation(key, n)[:k].astype(jnp.int32)
    else:
        seeds = jnp.asarray(seeds, jnp.int32)
        k = int(seeds.shape[0])
    seeds0 = seeds
    agg_id, seeds = _lloyd_core(C, seeds, maxiter)
    return agg_id, seeds, seeds0
