"""Row-partitioned Lloyd aggregation (distributed graph k-means).

The distributed counterpart of graph.lloyd (itself the jitted re-design of
pyamg's C++ ``lloyd_cluster`` used by the reference, ns/lib/graph.py:156-239).
One shard_map'd program runs the full Lloyd iteration with the matrix rows
sharded over the mesh's ``row`` axis:

1. multi-source Bellman-Ford assignment — halo min-exchange sweeps
   (the pbf kernel's relaxation, labels = cluster indices);
2. boundary detection — one halo exchange of the assignment vector;
3. interiorness = BF distance from the cluster boundary;
4. recentering — per-cluster argmax via local segment reductions combined
   across shards with pmax/pmin (min-gid tie-break, matching the serial
   kernel exactly).

The graph must be halo-encoded and stored transposed for directed C
(use :func:`mlamg_tpu.parallel.pbf_partition`); for the symmetric strength
graphs Lloyd actually runs on, orientation is a no-op.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mlamg_tpu.parallel.pspmv import PartitionedELL, _operands
from mlamg_tpu.parallel.pcycle import _halo_extend
from mlamg_tpu.parallel.distributed import make_global


def plloyd(
    A: PartitionedELL,
    seeds: np.ndarray,
    mesh: Mesh,
    maxiter: int = 10,
    bf_max_iter: int | None = None,
):
    """Distributed Lloyd clustering.

    Parameters
    ----------
    A : halo-encoded PartitionedELL (transposed orientation, see module doc)
    seeds : (k,) global node ids of the initial centers
    Returns (agg (S, n_loc) int32 cluster indices, centers (k,) global ids).
    """
    S, n_loc, h = A.num_shards, A.n_loc, A.halo
    assert h is not None, "plloyd requires a halo-encoded partition"
    n = S * n_loc
    n_real = A.shape[0]
    if bf_max_iter is None:
        bf_max_iter = n
    seeds = np.asarray(seeds, np.int32)
    k = seeds.shape[0]

    fwd_perm = [((i - 1) % S, i) for i in range(S)]
    bwd_perm = [((i + 1) % S, i) for i in range(S)]

    def kernel(data, col, centers):
        data, col = data[0], col[0]
        sid = jax.lax.axis_index("row")
        base = sid * n_loc
        gid = base + jax.lax.iota(jnp.int32, n_loc)

        live = data != 0.0
        w = jnp.where(live, data, jnp.inf)

        def ext(v, fill):
            return _halo_extend(v, h, S, sid, fwd_perm, bwd_perm, fill)

        def bf(dist0, near0):
            """Halo-exchange BF: propagate (distance, nearest-center-gid)
            minima.  Labels are center *node ids* with min-id tie-break —
            exactly the serial kernel's semantics (graph/bellman_ford.py),
            which matter on tie-heavy (e.g. unit-weight) graphs."""

            def cond(state):
                _, _, changed, it = state
                return (changed > 0) & (it < bf_max_iter)

            def body(state):
                dist, near, _, it = state
                dist_ext = ext(dist, jnp.inf)
                near_ext = ext(near.astype(dist.dtype), jnp.array(float(n))).astype(
                    jnp.int32
                )
                cand = dist_ext[col] + w  # (n_loc, width)
                best = jnp.min(cand, axis=1)
                improved = best < dist
                new_dist = jnp.where(improved, best, dist)
                # serial tie-break: among winner edges, smallest center gid
                win = cand <= new_dist[:, None]
                near_cand = jnp.min(
                    jnp.where(win, near_ext[col], n), axis=1
                )
                new_near = jnp.where(improved, near_cand, near)
                changed = jax.lax.psum(jnp.any(improved).astype(jnp.int32), "row")
                return new_dist, new_near, changed, it + 1

            return jax.lax.while_loop(
                cond, body, (dist0, near0, jnp.int32(1), jnp.int32(0))
            )[:2]

        def seed_state(centers):
            # local (dist0, near0) from the replicated center gid list
            is_c = jnp.any(gid[:, None] == centers[None, :], axis=1)
            near = jnp.where(is_c, gid, n).astype(jnp.int32)
            dist = jnp.where(is_c, 0.0, jnp.inf).astype(data.dtype)
            return dist, near

        def to_label(near, centers):
            # cluster index of each node: position of its center gid in
            # ``centers`` (k sentinel for unassigned)
            m = near[:, None] == centers[None, :]  # (n_loc, k)
            return jnp.where(
                jnp.any(m, axis=1), jnp.argmax(m, axis=1).astype(jnp.int32), k
            )

        def lloyd_iter(it, centers):
            dist0, near0 = seed_state(centers)
            dist, near = bf(dist0, near0)
            agg = to_label(near, centers)

            # boundary nodes: any live edge to a different cluster
            agg_ext = ext(agg.astype(data.dtype), jnp.array(float(k))).astype(
                jnp.int32
            )
            nbr_agg = agg_ext[col]
            cross = live & (nbr_agg != agg[:, None]) & (nbr_agg < k)
            is_boundary = jnp.any(cross, axis=1) & (agg < k)

            bdist0 = jnp.where(is_boundary, 0.0, jnp.inf).astype(data.dtype)
            interior_dist, _ = bf(bdist0, agg)
            vals = jnp.where(jnp.isinf(interior_dist), dist, interior_dist)
            vals = jnp.where(agg < k, vals, -jnp.inf)

            # per-cluster argmax with min-gid tie-break, across shards
            seg = jnp.minimum(agg, k - 1)
            one_hot = jax.nn.one_hot(seg, k, dtype=data.dtype)
            vloc = jnp.where(agg < k, vals, -jnp.inf)
            best_loc = jnp.max(
                jnp.where(one_hot > 0, vloc[:, None], -jnp.inf), axis=0
            )  # (k,)
            best = jax.lax.pmax(best_loc, "row")
            is_best = (vloc[:, None] >= best[None, :]) & (one_hot > 0)
            cand_gid = jnp.where(is_best, gid[:, None], n)
            win_loc = jnp.min(cand_gid, axis=0)  # (k,)
            winner = jax.lax.pmin(win_loc, "row")
            new_centers = jnp.where(winner >= n, centers, winner).astype(jnp.int32)
            return new_centers

        centers = jax.lax.fori_loop(0, maxiter, lloyd_iter, centers)
        dist0, near0 = seed_state(centers)
        _, near = bf(dist0, near0)
        agg = to_label(near, centers)
        return agg[None, :], centers

    centers0 = jnp.asarray(seeds, jnp.int32)
    data, col = _operands(A, mesh)
    agg, centers = jax.jit(
        jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P("row", None, None), P("row", None, None), P()),
            out_specs=(P("row", None), P()),
            check_vma=False,
        )
    )(data, col, centers0)
    return agg, centers
