"""Row-partitioned SpMV over the mesh's ``row`` axis.

The missing axis in the reference (SURVEY.md §5: matrices are never
partitioned — every worker holds full copies).  Here a matrix's rows are
split into contiguous shards in ELL layout and the input vector is sharded
the same way; SpMV under ``shard_map`` comes in two flavours:

- :func:`pspmv` — general matrices: one ``all_gather`` of x over ICI, then
  a local ELL SpMV with global column ids.
- :func:`pspmv_halo` — banded/local matrices (FEM meshes ordered along an
  axis): each shard only exchanges a fixed-width *halo* of boundary entries
  with its ring neighbours via ``ppermute`` — O(halo) traffic instead of
  O(n), the sparse-matrix analogue of sequence-parallel ring exchange.

Constructors are host-side (setup phase); the products are pure collectives
+ VPU work, differentiable, and identical on 1 or N devices.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "col"],
    meta_fields=["shape", "num_shards", "halo"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedELL:
    """Row-sharded ELL.

    data : (S, n_loc, w) values
    col  : (S, n_loc, w) int32 — global ids (halo == None) or local-extended
           ids in [0, 2*halo + n_loc) when halo is set
    """

    data: jax.Array
    col: jax.Array
    shape: Tuple[int, int]
    num_shards: int
    halo: int | None

    @property
    def n_loc(self) -> int:
        return int(self.data.shape[1])

    @staticmethod
    def from_scipy(A, num_shards: int, halo: int | None = None, dtype=jnp.float32):
        """Partition a scipy CSR into ``num_shards`` contiguous row blocks.

        With ``halo=h``, asserts every entry's column lies within h of the
        owning block (bandwidth check) and stores local-extended column ids;
        rows are zero-padded so every shard is (n_loc, w).
        """
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        A.sort_indices()
        n = A.shape[0]
        n_loc = -(-n // num_shards)
        w = int(np.diff(A.indptr).max())
        data = np.zeros((num_shards, n_loc, w), dtype=np.dtype(dtype))
        col = np.zeros((num_shards, n_loc, w), dtype=np.int32)
        for s in range(num_shards):
            lo, hi = s * n_loc, min((s + 1) * n_loc, n)
            for i in range(lo, hi):
                entries = slice(A.indptr[i], A.indptr[i + 1])
                c = A.indices[entries]
                v = A.data[entries]
                if halo is not None:
                    if len(c) and (c.min() < lo - halo or c.max() >= lo + n_loc + halo):
                        raise ValueError(
                            f"matrix bandwidth exceeds halo={halo} at row {i}"
                        )
                    c = c - (lo - halo)  # local-extended ids
                data[s, i - lo, : len(v)] = v
                col[s, i - lo, : len(c)] = c
        return PartitionedELL(
            jnp.asarray(data), jnp.asarray(col), (n, A.shape[1]), num_shards, halo
        )

    def shard_x(self, x, mesh: Mesh | None = None):
        """(n,) vector -> (S, n_loc) row-sharded layout (zero padded).

        Multi-process safe: with a host mesh the result is a global array
        whose shards live on their owning processes.
        """
        n = self.shape[0]
        S, n_loc = self.num_shards, self.n_loc
        xs = np.zeros((S * n_loc,), np.asarray(x).dtype)
        xs[:n] = np.asarray(x)
        xs = xs.reshape(S, n_loc)
        if mesh is not None:
            from mlamg_tpu.parallel.distributed import make_global

            return make_global(xs, mesh, P("row", None))
        return jnp.asarray(xs)

    def to_global(self, mesh: Mesh):
        """Global-array (data, col) pair sharded over the mesh's row axis —
        required when the mesh spans multiple processes."""
        from mlamg_tpu.parallel.distributed import make_global

        return (
            make_global(self.data, mesh, P("row", None, None)),
            make_global(self.col, mesh, P("row", None, None)),
        )


def _local_spmv(data, col, x_src):
    return jnp.sum(data * x_src[col], axis=1)


def pspmv(A: PartitionedELL, xs: jax.Array, mesh: Mesh) -> jax.Array:
    """General row-partitioned SpMV: all-gather x, local ELL product.

    xs : (S, n_loc) sharded over 'row'. Returns (S, n_loc) sharded result.
    """
    assert A.halo is None, "use pspmv_halo for halo-encoded matrices"

    def kernel(data, col, x_loc):
        # data/col: (1, n_loc, w) block; x_loc: (1, n_loc)
        x_full = jax.lax.all_gather(x_loc[0], "row", tiled=True)  # (n_pad,)
        y = _local_spmv(data[0], col[0], x_full)
        return y[None, :]

    data, col = _operands(A, mesh)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("row", None, None), P("row", None, None), P("row", None)),
        out_specs=P("row", None),
        check_vma=False,
    )(data, col, xs)


def _operands(A: PartitionedELL, mesh: Mesh):
    """(data, col) ready for a shard_map over ``mesh`` — globalized when the
    mesh spans processes (shard_map requires global arrays there)."""
    if jax.process_count() > 1:
        return A.to_global(mesh)
    return A.data, A.col


def pspmv_halo(A: PartitionedELL, xs: jax.Array, mesh: Mesh) -> jax.Array:
    """Halo-exchange row-partitioned SpMV: ppermute boundary slices from the
    ring neighbours, then one local ELL product on the extended vector."""
    assert A.halo is not None
    h = A.halo
    S = A.num_shards

    def kernel(data, col, x_loc):
        x = x_loc[0]  # (n_loc,)
        right_edge = x[-h:]  # goes to right neighbour's left halo
        left_edge = x[:h]  # goes to left neighbour's right halo
        from_left = jax.lax.ppermute(
            right_edge, "row", [((i - 1) % S, i) for i in range(S)]
        )
        from_right = jax.lax.ppermute(
            left_edge, "row", [((i + 1) % S, i) for i in range(S)]
        )
        # Zero the wrapped-around halos at the chain ends (block-tridiagonal
        # structure: the first shard has no left neighbour, etc.).
        idx = jax.lax.axis_index("row")
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == S - 1, 0.0, from_right)
        x_ext = jnp.concatenate([from_left, x, from_right])
        y = _local_spmv(data[0], col[0], x_ext)
        return y[None, :]

    data, col = _operands(A, mesh)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("row", None, None), P("row", None, None), P("row", None)),
        out_specs=P("row", None),
        check_vma=False,
    )(data, col, xs)


def partitioned_jacobi(
    A: PartitionedELL, dinv: jax.Array, b: jax.Array, xs: jax.Array, mesh: Mesh,
    omega: float = 0.666, nu: int = 2, use_halo: bool = True
):
    """Row-partitioned weighted-Jacobi sweeps (the distributed smoother).

    dinv/b/xs are (S, n_loc) sharded over 'row'.
    """
    mv = pspmv_halo if use_halo else pspmv
    for _ in range(nu):
        xs = xs + omega * dinv * (b - mv(A, xs, mesh))
    return xs
