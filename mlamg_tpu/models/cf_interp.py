"""C/F-splitting interpolation network (the deployed model family).

Role of ns/model/ali_interp.py: given a C/F splitting (from greedy
coarsening), a residual TAGConv stack scores the C<->F edges of the matrix
graph and emits an interpolation operator P with unit diagonal on coarse
points, columns restricted to C.  This is the network the reference's
MLAMG preconditioner loads at solver setup (ns/preconditioner/MLAMG.py:105-111).

Static-shape re-design: instead of deleting C-C/F-F edges from a networkx
graph (ali_interp.py:235-256), edges are masked in place (weight 0), and the
column slice P[:, C] is a static gather using a precomputed C-rank map.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.models.graphdata import GraphData
from mlamg_tpu.models.gnn import TAGConv, InstanceNorm, EdgeModel


def cf_graph(A: CSR, is_coarse: jax.Array) -> GraphData:
    """Graph for C/F interpolation: node feature = 1 on C, edge weights
    |a_ij| kept only on C<->F edges (reference ali_interp.py:235-256)."""
    n = A.shape[0]
    rsafe = jnp.minimum(A.row, n - 1)
    cross = is_coarse[rsafe] != is_coarse[A.col]
    keep = A.mask & cross
    attr = jnp.where(keep, jnp.abs(A.data), 0.0)[:, None]
    x = jnp.where(is_coarse, 1.0, 0.0)[:, None].astype(A.data.dtype)
    return GraphData(jnp.where(keep, A.row, n), jnp.where(keep, A.col, 0), attr, x, n)


class ResidualTAGStack(nn.Module):
    """TAGConv residual tower with instance norms + edge head
    (reference ali_interp.py:107-175).  ``dims`` gives the channel plan."""

    dims: Sequence[int] = (16, 16, 32, 32, 64, 64)
    K: int = 5
    edge_hidden: int = 64

    @nn.compact
    def __call__(self, g: GraphData):
        ew = g.edge_attr[:, 0]
        x = TAGConv(self.dims[0], K=self.K, name="tag_in")(g, g.x, ew)
        x = nn.relu(InstanceNorm()(x))
        for i in range(len(self.dims) - 1):
            h = TAGConv(self.dims[i + 1], K=self.K, name=f"tag_{i}a")(g, x, ew)
            h = nn.relu(h)
            h = TAGConv(self.dims[i + 1], K=self.K, name=f"tag_{i}b")(g, h, ew)
            h = InstanceNorm()(h)
            if h.shape == x.shape:
                h = h + x
            x = nn.relu(h)
        x = nn.relu(TAGConv(self.dims[-1], K=self.K, name="tag_out")(g, x, ew))

        src = jnp.minimum(g.src, g.n - 1)
        e = EdgeModel(self.edge_hidden, 1, name="edge_head")(
            jnp.where(g.edge_mask[:, None], x[src], 0.0),
            jnp.where(g.edge_mask[:, None], x[jnp.minimum(g.dst, g.n - 1)], 0.0),
            g.edge_attr,
        )
        # standardize then take magnitudes (reference ali_interp.py:174-175),
        # over live edges only
        mask = g.edge_mask
        cnt = jnp.maximum(jnp.sum(mask), 1)
        mean = jnp.sum(jnp.where(mask, e[:, 0], 0.0)) / cnt
        var = jnp.sum(jnp.where(mask, (e[:, 0] - mean) ** 2, 0.0)) / cnt
        return jnp.abs((e[:, 0] - mean) * jax.lax.rsqrt(var + 1e-8))


class CFInterpolationNetwork(nn.Module):
    """P from a C/F splitting (reference ali_interp.py:228-285).

    ``row_normalize`` (default, a departure from the reference) rescales
    every F row of P to unit sum so the interpolation reproduces constants
    — the near-nullspace the smoother cannot reduce.  Without it the edge
    head's abs-standardized output (reference ali_interp.py:174-175) fixes
    the score *distribution*, so the optimizer cannot control interpolation
    magnitudes at all and amg_loss plateaus (observed: flat 0.91-0.94
    train loss); with it the network only has to learn relative weights.
    """

    dims: Sequence[int] = (16, 16, 32, 32, 64, 64)
    K: int = 5
    row_normalize: bool = True

    def setup(self):
        self.model = ResidualTAGStack(dims=self.dims, K=self.K)

    def __call__(self, A: CSR, is_coarse: jax.Array, c_rank: jax.Array, num_coarse: int) -> CSR:
        """P as CSR (n, num_coarse).

        is_coarse : (n,) bool; c_rank : (n,) int32 with c_rank[c] = column of
        coarse point c (anything for F nodes); num_coarse static.
        """
        n = A.shape[0]
        g = cf_graph(A, is_coarse)
        w = self.model(g)

        # edge (i -> j) contributes P[i, rank[j]] when j is coarse & i fine
        rsafe = jnp.minimum(A.row, n - 1)
        keep = g.edge_mask & is_coarse[A.col] & (~is_coarse[rsafe])
        rows = jnp.where(keep, A.row, n)
        cols = jnp.where(keep, c_rank[A.col], 0).astype(jnp.int32)
        vals = jnp.where(keep, w, 0.0)

        if self.row_normalize:
            rs = jax.ops.segment_sum(vals, rows, num_segments=n + 1)[:n]
            cnt = jax.ops.segment_sum(
                keep.astype(vals.dtype), rows, num_segments=n + 1
            )[:n]
            # rows whose scores summed to ~0 fall back to uniform weights
            # over their C neighbours (never a zero interpolation row)
            normed = jnp.where(
                rs[rsafe] > 1e-12,
                vals / jnp.where(rs[rsafe] > 1e-12, rs[rsafe], 1.0),
                1.0 / jnp.maximum(cnt[rsafe], 1.0),
            )
            vals = jnp.where(keep, normed, 0.0)

        # unit diagonal on coarse points: append one entry per node (masked)
        node_rows = jnp.where(is_coarse, jnp.arange(n, dtype=jnp.int32), n)
        node_cols = jnp.where(is_coarse, c_rank, 0).astype(jnp.int32)
        node_vals = jnp.where(is_coarse, 1.0, 0.0).astype(vals.dtype)

        from mlamg_tpu.ops.sparse import COO

        all_rows = jnp.concatenate([rows, node_rows])
        all_cols = jnp.concatenate([cols, node_cols])
        all_vals = jnp.concatenate([vals, node_vals])
        return COO(all_vals, all_rows, all_cols, (n, num_coarse), all_rows.shape[0]).sort_rows()


def cf_rank(is_coarse: np.ndarray):
    """Host helper: (c_rank, num_coarse) from a boolean C mask."""
    is_coarse = np.asarray(is_coarse, bool)
    rank = np.cumsum(is_coarse) - 1
    return rank.astype(np.int32), int(is_coarse.sum())
