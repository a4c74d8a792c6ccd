"""Multi-source Bellman-Ford on sparse graphs, as iterated edge relaxation.

TPU-native replacement for the reference's pure-python edge-sweep
``modified_bellman_ford`` (ns/lib/graph.py:7-53) and the pyamg C++
``bellman_ford`` it calls in the model forward (ns/model/agg_interp.py:475).

Instead of a sequential sweep, each iteration relaxes *every* edge at once:

    cand_j  = min_{(i,j) in E} dist_i + w_ij       (segment-min over targets)

and a ``lax.while_loop`` runs until no distance changes (or ``max_iter``,
a graph-diameter bound).  Each iteration is two segment reductions — pure
VPU work with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR, COO

_BIG = jnp.inf


def bellman_ford(C, centers: jax.Array, max_iter: int | None = None):
    """Distances + nearest-center assignment from ``centers``.

    Parameters
    ----------
    C : CSR/COO with non-negative edge weights. Entry (i, j) is an edge
        i -> j of length ``w_ij`` (same orientation as the reference:
        `distance[i] + d_ij < distance[j]` relaxes j from i).
    centers : (k,) int array of center node ids (static k).
    max_iter : sweep bound; defaults to n (worst-case path length).

    Returns
    -------
    distance : (n,) distances (inf for unreachable nodes)
    nearest : (n,) int32 id of the nearest center (n sentinel if unreachable)
    """
    n = C.shape[0]
    if max_iter is None:
        max_iter = n
    row, col, w = C.row, C.col, C.data
    # Padding entries have row == n -> dist lookup must not OOB; clamp and
    # rely on segment-drop of the sentinel col? Padding col is 0, which would
    # corrupt node 0. Mask padded edges by +inf weight instead.
    live = row < n
    w = jnp.where(live, w, jnp.inf)
    rsafe = jnp.minimum(row, n - 1)

    dist0 = jnp.full((n,), _BIG, C.data.dtype).at[centers].set(0.0)
    near0 = jnp.full((n,), n, jnp.int32).at[centers].set(centers.astype(jnp.int32))

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        dist, near, _, it = state
        cand = dist[rsafe] + w
        best = jax.ops.segment_min(cand, col, num_segments=n)
        improved = best < dist
        new_dist = jnp.where(improved, best, dist)
        # Winner edges: those achieving the new minimum at an improved node.
        win = live & (cand <= new_dist[col]) & improved[col]
        # Deterministic tie-break: smallest propagating center id.
        near_cand = jax.ops.segment_min(
            jnp.where(win, near[rsafe], n), col, num_segments=n
        )
        new_near = jnp.where(improved, near_cand, near)
        changed = jnp.any(improved)
        return new_dist, new_near, changed, it + 1

    dist, near, _, _ = jax.lax.while_loop(
        cond, body, (dist0, near0, jnp.bool_(True), jnp.int32(0))
    )
    return dist, near


def _transpose_data_order(C) -> jax.Array:
    """Permutation p with ``C.data[p]`` = the transpose's data laid out on
    C's own (row, col) structure — valid when C's *pattern* is symmetric
    (values may be directed).  Stable lexsort by (col, row); padding
    entries keep their tail position."""
    n = C.shape[0]
    live = C.row < n
    ck = jnp.where(live, C.col, n)
    rk = jnp.where(live, C.row, n)
    return jnp.lexsort((rk, ck))


def bellman_ford_pull(C, centers: jax.Array, *, width: int, max_iter: int | None = None):
    """Gather-only Bellman-Ford — same contract as :func:`bellman_ford`
    for symmetric-*pattern* C (the model pipeline's case: learned edge
    weights on A's FEM pattern, directed values).

    The push form relaxes by ``segment_min`` — an nnz-sized scatter per
    sweep, which XLA:TPU serializes (sort-based scatter); measured, the
    while-loop dominates the whole FullAggNet forward.  This form
    iterates in *pull* mode on the transposed weights laid out in ELL:

        dist_j = min_s  dist[col[j, s]] + w^T[j, s]

    — per sweep, two (n, width) gathers and a row-min.  No scatter, no
    segment ops; the one-time ELL repack is a single scatter per call.

    ``width`` is the static max row degree (= max col degree by pattern
    symmetry); callers compute it host-side from the pattern
    (cli/common.py dataset_bf_width, which also validates symmetry).
    When this function is called with *concrete* (non-traced) inputs the
    degree bound is re-checked here and a too-small width raises — under
    jit the host-side setup validation is the guard.
    """
    n = C.shape[0]
    if max_iter is None:
        max_iter = n
    if not isinstance(C.row, jax.core.Tracer):
        import numpy as _np

        rows = _np.asarray(C.row)
        deg = _np.bincount(rows[rows < n], minlength=1)
        if deg.max(initial=0) > width:
            raise ValueError(
                f"bellman_ford_pull: width={width} is smaller than the max "
                f"row degree {int(deg.max())} — edges would be silently "
                "dropped; recompute width with dataset_bf_width"
            )
    order = _transpose_data_order(C)
    data_t = C.data[order]

    # ELL repack with BF-friendly padding: col sentinel n (reads an
    # appended +inf), weight +inf.  (CSR.to_ell zero-fills padding, which
    # would let empty slots relax through node 0.)
    live = C.row < n
    rsafe = jnp.minimum(C.row, n - 1)
    indptr = C.indptr
    within = jnp.arange(C.row.shape[0], dtype=jnp.int32) - indptr[rsafe].astype(
        jnp.int32
    )
    slot = jnp.where(live & (within < width), rsafe * width + within, n * width)
    colE = (
        jnp.full(n * width + 1, n, jnp.int32)
        .at[slot]
        .set(jnp.where(live, C.col, n))[: n * width]
        .reshape(n, width)
    )
    wE = (
        jnp.full(n * width + 1, jnp.inf, C.data.dtype)
        .at[slot]
        .set(jnp.where(live, data_t, jnp.inf))[: n * width]
        .reshape(n, width)
    )

    dist0 = jnp.full((n,), _BIG, C.data.dtype).at[centers].set(0.0)
    near0 = jnp.full((n,), n, jnp.int32).at[centers].set(centers.astype(jnp.int32))

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        dist, near, _, it = state
        distp = jnp.concatenate([dist, jnp.full((1,), _BIG, dist.dtype)])
        nearp = jnp.concatenate([near, jnp.full((1,), n, jnp.int32)])
        cand = distp[colE] + wE  # (n, width)
        best = jnp.min(cand, axis=1)
        improved = best < dist
        new_dist = jnp.where(improved, best, dist)
        near_cand = jnp.min(
            jnp.where(cand <= new_dist[:, None], nearp[colE], n), axis=1
        )
        new_near = jnp.where(improved, near_cand, near)
        return new_dist, new_near, jnp.any(improved), it + 1

    dist, near, _, _ = jax.lax.while_loop(
        cond, body, (dist0, near0, jnp.bool_(True), jnp.int32(0))
    )
    return dist, near


def nearest_center_to_agg(centers: jax.Array, nearest: jax.Array) -> jax.Array:
    """Aggregate column id for every node: ``agg_id[i] = j`` s.t.
    ``centers[j] == nearest[i]`` (k sentinel for unassigned nodes).

    Jitted inverse-permutation replacement of the reference's python dict
    loop (ns/lib/graph.py:56-86).  The (n, k) assignment matrix itself is
    only formed on demand (see :func:`agg_matrix`).
    """
    n = nearest.shape[0]
    k = centers.shape[0]
    inv = jnp.full((n + 1,), k, jnp.int32).at[centers].set(
        jnp.arange(k, dtype=jnp.int32)
    )
    return inv[jnp.minimum(nearest, n)]


def agg_matrix_dense(agg_id: jax.Array, k: int) -> jax.Array:
    """(n, k) one-hot aggregate assignment (dense; for small k / MXU paths)."""
    return jax.nn.one_hot(agg_id, k, dtype=jnp.float32)


def agg_matrix_csr(agg_id: jax.Array, k: int) -> CSR:
    """(n, k) aggregate assignment as CSR (one entry per row)."""
    n = agg_id.shape[0]
    assigned = agg_id < k
    row = jnp.where(assigned, jnp.arange(n, dtype=jnp.int32), n)
    col = jnp.where(assigned, agg_id.astype(jnp.int32), 0)
    data = jnp.where(assigned, 1.0, 0.0)
    # Unassigned rows become sentinel entries mid-array; sort_rows restores
    # the sorted-row invariant.
    return COO(data, row, col, (n, k), n).sort_rows()
