"""Row-partitioned Bellman-Ford with halo min-exchange.

The distributed-aggregation analogue from the build plan (SURVEY.md §5/§7):
the distance and nearest-center vectors are sharded like the matrix rows;
each sweep relaxes the shard-local edges against a halo-extended view of
(dist, nearest) fetched from ring neighbours via ``ppermute``, and a
``psum`` of per-shard change flags decides global termination — the same
structural role ring-exchange plays for sequence parallelism.

Works on halo-encoded :class:`PartitionedELL` graphs (bandwidth-bounded,
e.g. RCM-ordered meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mlamg_tpu.parallel.pspmv import PartitionedELL


def pbf_partition(C, num_shards: int, halo: int, dtype=jnp.float64) -> PartitionedELL:
    """Partition a (possibly directed) strength graph for :func:`pbf`.

    ``pbf`` relaxes each local row i from its stored entries (pull form), so
    a stored entry (i, j) acts as the edge j -> i.  The serial kernel
    (graph.bellman_ford) treats C[i, j] as the edge i -> j; storing **C^T**
    makes the two exactly equivalent for any directed C (learned CNet
    weights are directed MLP outputs — orientation is load-bearing).
    """
    import scipy.sparse as sp

    return PartitionedELL.from_scipy(
        sp.csr_matrix(C).T.tocsr(), num_shards, halo=halo, dtype=dtype
    )


def pbf(
    A: PartitionedELL,
    centers_mask_sharded: jax.Array,
    mesh: Mesh,
    max_iter: int | None = None,
):
    """Distributed multi-source Bellman-Ford.

    Parameters
    ----------
    A : halo-encoded PartitionedELL holding the **transpose** of the serial
        kernel's graph (build it with :func:`pbf_partition`): the stored
        entry (i, col) relaxes local row i from node col, i.e. acts as the
        edge col -> i.  For symmetric graphs the transpose is a no-op, but
        for directed C (learned CNet output) it is required for serial
        equivalence.
    centers_mask_sharded : (S, n_loc) bool — True at center nodes.
    Returns (dist (S, n_loc), nearest_global_id (S, n_loc)).
    """
    S = A.num_shards
    n_loc = A.n_loc
    h = A.halo
    assert h is not None, "pbf requires a halo-encoded partition"
    n = S * n_loc
    if max_iter is None:
        max_iter = n

    fwd_perm = [((i - 1) % S, i) for i in range(S)]
    bwd_perm = [((i + 1) % S, i) for i in range(S)]

    def kernel(data, col, centers_mask):
        data = data[0]  # (n_loc, w)
        col = col[0]
        cmask = centers_mask[0]
        sid = jax.lax.axis_index("row")
        base = sid * n_loc
        gid = base + jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)[:, 0]

        dist0 = jnp.where(cmask, 0.0, jnp.inf).astype(data.dtype)
        near0 = jnp.where(cmask, gid, n).astype(jnp.int32)

        live = data != 0.0  # padded slots carry weight 0 — treat as absent
        w = jnp.where(live, data, jnp.inf)

        def halo_ext(v, fill):
            right_edge = v[-h:]
            left_edge = v[:h]
            from_left = jax.lax.ppermute(right_edge, "row", fwd_perm)
            from_right = jax.lax.ppermute(left_edge, "row", bwd_perm)
            from_left = jnp.where(sid == 0, fill, from_left)
            from_right = jnp.where(sid == S - 1, fill, from_right)
            return jnp.concatenate([from_left, v, from_right])

        def cond(state):
            _, _, changed, it = state
            return (changed > 0) & (it < max_iter)

        def body(state):
            dist, near, _, it = state
            dist_ext = halo_ext(dist, jnp.inf)
            near_ext = halo_ext(near.astype(dist.dtype), jnp.float32(n)).astype(jnp.int32)
            # edge (local row i) -> target col (local-extended id): relax the
            # *local row* from the (possibly remote) column neighbour; with a
            # symmetric graph this covers both directions over sweeps.
            cand = dist_ext[col] + w  # (n_loc, w)
            best = jnp.min(cand, axis=1)
            improved = best < dist
            new_dist = jnp.where(improved, best, dist)
            arg = jnp.argmin(cand, axis=1)
            new_near = jnp.where(
                improved, near_ext[col[jnp.arange(n_loc), arg]], near
            )
            changed = jax.lax.psum(jnp.any(improved).astype(jnp.int32), "row")
            return new_dist, new_near, changed, it + 1

        dist, near, _, _ = jax.lax.while_loop(
            cond, body, (dist0, near0, jnp.int32(1), jnp.int32(0))
        )
        return dist[None, :], near[None, :]

    from mlamg_tpu.parallel.pspmv import _operands

    data, col = _operands(A, mesh)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("row", None, None), P("row", None, None), P("row", None)),
        out_specs=(P("row", None), P("row", None)),
        check_vma=False,
    )(data, col, centers_mask_sharded)
