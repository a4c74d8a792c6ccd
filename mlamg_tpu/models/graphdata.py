"""Static-shape graph features straight from sparse matrices.

Replaces the reference's scipy -> networkx -> torch_geometric conversion
chain (ns/model/data.py:22-62 — a python loop over edges) with direct
COO-to-feature construction: the matrix's stored entries *are* the edge
list, so building model inputs is O(nnz) device work with no host loop.

Padding: edges with ``src == n`` are padding (mask them in segment ops);
node arrays are exact-size (models treat n as static per problem bucket).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "dst", "edge_attr", "x", "node_mask", "in_ell"],
    meta_fields=["n"],
)
@dataclasses.dataclass(frozen=True)
class GraphData:
    """Edge-list graph with node/edge features.

    src, dst : (E_pad,) int32; src == n marks padding
    edge_attr: (E_pad, F) float
    x        : (n, Fx) float node features
    node_mask: (n,) bool or None — False marks padding nodes (grids padded
        to a shape bucket); global reductions (InstanceNorm) must ignore
        padding so a padded grid's real-node outputs match the unpadded run
    in_ell   : (n, w) int32 or None — edge-list positions of each node's
        incoming edges (E_pad sentinel in empty slots).  When present,
        every message aggregation runs as gather + row-sum instead of a
        ``segment_sum`` scatter — XLA:TPU serializes nnz-sized scatters
        (sort-based), and the ~30 per-conv scatters dominate the model
        forward.  Built once per graph by :func:`build_in_ell`.
    """

    src: jax.Array
    dst: jax.Array
    edge_attr: jax.Array
    x: jax.Array
    n: int
    node_mask: jax.Array | None = None
    in_ell: jax.Array | None = None

    @property
    def num_edges_pad(self) -> int:
        return int(self.src.shape[0])

    @property
    def edge_mask(self) -> jax.Array:
        return self.src < self.n


def _node_init(n: int, n_real, dtype):
    """Node feature 1/n (reference data.py:39-46); with padding, real nodes
    get 1/n_real and padding nodes 0, so real outputs match the unpadded
    run exactly.  Returns (x, node_mask)."""
    if n_real is None:
        return jnp.full((n, 1), 1.0 / n, dtype), None
    nid = jnp.arange(n)
    mask = nid < n_real
    x = jnp.where(mask, 1.0 / n_real, 0.0).astype(dtype)[:, None]
    return x, mask


def build_in_ell(row: jax.Array, col: jax.Array, n: int, width: int) -> jax.Array:
    """(n, width) edge-list positions of each node's incoming edges.

    ``width`` is the static max in-degree of the pattern — callers derive
    it host-side from the problem family (cli/common.py dataset_bf_width).
    With *concrete* (non-traced) inputs an in-degree exceeding ``width``
    raises here; under jit the host-side setup validation is the guard
    (messages past ``width`` would otherwise be silently dropped).
    Jittable: one lexsort, one searchsorted, one scatter — paid once per
    graph and amortized over every conv's aggregation."""
    E_pad = row.shape[0]
    if not isinstance(col, jax.core.Tracer) and not isinstance(row, jax.core.Tracer):
        import numpy as _np

        live_np = _np.asarray(row) < n
        indeg = _np.bincount(_np.asarray(col)[live_np], minlength=1)
        if indeg.max(initial=0) > width:
            raise ValueError(
                f"build_in_ell: width={width} is smaller than the max "
                f"in-degree {int(indeg.max())} — messages would be silently "
                "dropped; recompute width with dataset_bf_width"
            )
    live = row < n
    ck = jnp.where(live, col, n)
    rk = jnp.where(live, row, n)
    order = jnp.lexsort((rk, ck))  # edge ids sorted by (dst, src); pad last
    dst_sorted = ck[order]
    first = jnp.searchsorted(dst_sorted, dst_sorted, side="left")
    within = jnp.arange(E_pad, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (dst_sorted < n) & (within < width)
    slot = jnp.where(ok, dst_sorted * width + within, n * width)
    return (
        jnp.full(n * width + 1, E_pad, jnp.int32)
        .at[slot]
        .set(order.astype(jnp.int32))[: n * width]
        .reshape(n, width)
    )


def graph_from_matrix_basic(A: CSR, n_real=None, ell_width=None,
                            rel_strength: bool = False) -> GraphData:
    """Node features 1/n, edge feature |a_ij| (reference data.py:39-46).

    ``rel_strength`` appends a second, scale-invariant edge feature
    |a_ij| / max_j' |a_ij'| (classic row-normalized strength of connection):
    on anisotropic operators whose off-diagonals span orders of magnitude
    the raw |a_ij| is badly conditioned as a GNN input, while the relative
    strength directly encodes which neighbours are strong regardless of the
    operator's scaling.  Changes parameter shapes — record the flag in
    checkpoints (cli net_config)."""
    n = A.shape[0]
    x, mask = _node_init(n, n_real, A.data.dtype)
    absa = jnp.where(A.mask, jnp.abs(A.data), 0.0)
    if rel_strength:
        rsafe = jnp.minimum(A.row, n - 1)
        offdiag = jnp.where(rsafe == A.col, 0.0, absa)
        rowmax = jax.ops.segment_max(
            offdiag, rsafe, num_segments=n, indices_are_sorted=True
        )
        rel = absa / jnp.maximum(rowmax[rsafe], 1e-30)
        rel = jnp.where(A.mask & (rsafe != A.col), rel, 0.0)
        attr = jnp.stack([absa, rel], axis=1)
    else:
        attr = absa[:, None]
    in_ell = (
        None if ell_width is None else build_in_ell(A.row, A.col, n, ell_width)
    )
    return GraphData(A.row, A.col, attr, x, n, mask, in_ell)


def graph_from_matrix(A: CSR, agg_id: jax.Array, n_real=None, ell_width=None) -> GraphData:
    """Two edge features: |a_ij| and cluster adjacency (0 = same aggregate,
    1 = different), reference data.py:22-37."""
    n = A.shape[0]
    x, mask = _node_init(n, n_real, A.data.dtype)
    rsafe = jnp.minimum(A.row, n - 1)
    same = agg_id[rsafe] == agg_id[A.col]
    attr = jnp.stack([jnp.abs(A.data), jnp.where(same, 0.0, 1.0)], axis=1)
    attr = jnp.where(A.mask[:, None], attr, 0.0)
    in_ell = (
        None if ell_width is None else build_in_ell(A.row, A.col, n, ell_width)
    )
    return GraphData(A.row, A.col, attr, x, n, mask, in_ell)


def graph_from_matrix_node_vals(A: CSR, x: jax.Array) -> GraphData:
    """Caller-supplied node features, signed edge weights (data.py:48-51)."""
    n = A.shape[0]
    if x.ndim == 1:
        x = x[:, None]
    attr = jnp.where(A.mask[:, None], A.data[:, None], 0.0)
    return GraphData(A.row, A.col, attr, x, n)


def gather_src(g: GraphData, x: jax.Array) -> jax.Array:
    """x[src] with padding rows zeroed."""
    xs = x[jnp.minimum(g.src, g.n - 1)]
    return jnp.where(g.edge_mask[:, None], xs, 0.0)


def gather_dst(g: GraphData, x: jax.Array) -> jax.Array:
    xd = x[jnp.minimum(g.dst, g.n - 1)]
    return jnp.where(g.edge_mask[:, None], xd, 0.0)


def scatter_to_dst(g: GraphData, messages: jax.Array) -> jax.Array:
    """Sum edge messages into destination nodes (padding dropped).

    With ``g.in_ell`` this is a gather + row-sum (no scatter); otherwise
    a segment-sum."""
    if g.in_ell is not None:
        pad_shape = (1,) + messages.shape[1:]
        mp = jnp.concatenate([messages, jnp.zeros(pad_shape, messages.dtype)], 0)
        return jnp.sum(mp[g.in_ell], axis=1)
    dst = jnp.where(g.edge_mask, g.dst, g.n)
    return jax.ops.segment_sum(messages, dst, num_segments=g.n)
