"""Connected components by parallel label propagation.

Replaces the reference's python BFS ``num_connected_components``
(ns/lib/graph.py:89-122) and ``check_aggregates_connected``
(ns/lib/graph.py:125-153) with min-label flooding: every node repeatedly
takes the minimum label among itself and its neighbours — O(diameter)
iterations of two segment-mins, all on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(C, max_iter: int | None = None) -> jax.Array:
    """(n,) component labels (the min node id in each component).

    ``C`` is any CSR/COO container; edges are treated as undirected.
    """
    n = C.shape[0]
    if max_iter is None:
        max_iter = n
    live = C.row < n
    r = jnp.minimum(C.row, n - 1)
    c = C.col

    label0 = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        label, _, it = state
        fwd = jax.ops.segment_min(jnp.where(live, label[r], n), c, num_segments=n)
        bwd = jax.ops.segment_min(jnp.where(live, label[c], n), r, num_segments=n)
        new = jnp.minimum(label, jnp.minimum(fwd, bwd)).astype(jnp.int32)
        return new, jnp.any(new != label), it + 1

    label, _, _ = jax.lax.while_loop(cond, body, (label0, jnp.bool_(True), 0))
    return label


def num_connected_components(C) -> jax.Array:
    """Number of connected components (traced scalar)."""
    label = connected_components(C)
    n = C.shape[0]
    return jnp.sum(label == jnp.arange(n, dtype=jnp.int32))


def check_aggregates_connected(C, agg_id: jax.Array, k: int) -> jax.Array:
    """True iff every aggregate induces a connected subgraph.

    Label propagation restricted to intra-aggregate edges; connected
    aggregates produce exactly one surviving label each (the reference's
    invariant, ns/lib/graph.py:125-153, without forming block matrices).
    """
    n = C.shape[0]
    live = (C.row < n) & (agg_id[jnp.minimum(C.row, n - 1)] == agg_id[C.col])
    masked = type(C)(
        jnp.where(live, C.data, 0),
        jnp.where(live, C.row, n),
        jnp.where(live, C.col, 0),
        *(
            (C.indptr,) if hasattr(C, "indptr") else ()
        ),
        shape=C.shape,
        nnz=C.nnz,
    )
    label = connected_components(masked)
    n_comp = jnp.sum(label == jnp.arange(n, dtype=jnp.int32))
    # Count non-empty aggregates (sentinel/unassigned ids are dropped).
    present = jnp.zeros((k,), jnp.int32).at[agg_id].set(1, mode="drop")
    return n_comp == jnp.sum(present)
