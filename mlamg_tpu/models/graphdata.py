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
    data_fields=["src", "dst", "edge_attr", "x", "node_mask"],
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
    """

    src: jax.Array
    dst: jax.Array
    edge_attr: jax.Array
    x: jax.Array
    n: int
    node_mask: jax.Array | None = None

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


def graph_from_matrix_basic(A: CSR, n_real=None) -> GraphData:
    """Node features 1/n, edge feature |a_ij| (reference data.py:39-46)."""
    n = A.shape[0]
    x, mask = _node_init(n, n_real, A.data.dtype)
    attr = jnp.abs(A.data)[:, None]
    attr = jnp.where(A.mask[:, None], attr, 0.0)
    return GraphData(A.row, A.col, attr, x, n, mask)


def graph_from_matrix(A: CSR, agg_id: jax.Array, n_real=None) -> GraphData:
    """Two edge features: |a_ij| and cluster adjacency (0 = same aggregate,
    1 = different), reference data.py:22-37."""
    n = A.shape[0]
    x, mask = _node_init(n, n_real, A.data.dtype)
    rsafe = jnp.minimum(A.row, n - 1)
    same = agg_id[rsafe] == agg_id[A.col]
    attr = jnp.stack([jnp.abs(A.data), jnp.where(same, 0.0, 1.0)], axis=1)
    attr = jnp.where(A.mask[:, None], attr, 0.0)
    return GraphData(A.row, A.col, attr, x, n, mask)


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
    """Sum edge messages into destination nodes (padding dropped)."""
    dst = jnp.where(g.edge_mask, g.dst, g.n)
    return jax.ops.segment_sum(messages, dst, num_segments=g.n)
