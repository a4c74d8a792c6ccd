"""Row-partitioned two-level / multilevel AMG solves (the distributed
analogue of mg.cycle.twolevel_solve / the reference's amg_2_v,
ns/lib/multigrid.py:111-210).

Everything lives in ONE shard_map'd XLA program over the mesh's ``row``
axis:

- smoothing: local weighted-Jacobi sweeps with halo exchange (ppermute);
- residual: local ELL SpMV on the halo-extended iterate;
- Galerkin coarse operator: the "AP-then-reduce" distributed RAP —
  AP is local (halo-extended P rows), A_H = psum(P_loc^T AP_loc) over the
  row axis, replicated on every shard;
- coarse solve: replicated dense LU of the (k, k) operator (k = alpha*n is
  small by construction — the reference's SuperLU role), or, for the
  multilevel form, a replicated V-cycle over the coarse chain;
- restriction/prolongation: local (n_loc, k) contractions + one psum;
- convergence: residual norms via psum, identical readout semantics to the
  serial solver (multigrid.py:196-208), so the distributed conv factor
  matches the serial one to roundoff.

Communication per iteration: 2*(pre+post+1) halo ppermutes of (h,) slices
+ 2 psums of (k,)/scalar — the sparse-solver analogue of sequence-parallel
ring exchange.

Compiled kernels are cached per (mesh, shapes, solver config): repeated
solves (GA fitness, preconditioner applies, scaling sweeps) reuse the same
XLA program.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mlamg_tpu.parallel.pspmv import PartitionedELL, _operands
from mlamg_tpu.parallel.distributed import make_global


def _halo_extend(v, h: int, S: int, sid, fwd_perm, bwd_perm, fill):
    """Extend a local (n_loc, ...) block with h rows from each ring
    neighbour (chain ends filled with ``fill``)."""
    right_edge = v[-h:]
    left_edge = v[:h]
    from_left = jax.lax.ppermute(right_edge, "row", fwd_perm)
    from_right = jax.lax.ppermute(left_edge, "row", bwd_perm)
    from_left = jnp.where(sid == 0, fill, from_left)
    from_right = jnp.where(sid == S - 1, fill, from_right)
    return jnp.concatenate([from_left, v, from_right])


def _prep_fine_level(A: PartitionedELL, P_rows, mesh: Mesh):
    """Shared fine-level prep: (P_sh, dinv_sh, k) for a row-sharded level."""
    S, n_loc, h = A.num_shards, A.n_loc, A.halo
    n = A.shape[0]
    P_rows = np.asarray(P_rows)
    if P_rows.ndim == 2:
        k = P_rows.shape[1]
        Pp = np.zeros((S * n_loc, k), P_rows.dtype)
        Pp[:n] = P_rows
        P_rows = Pp.reshape(S, n_loc, k)
    P_sh = make_global(P_rows, mesh, P("row", None, None))

    diag = np.zeros(S * n_loc, P_rows.dtype)
    data_h = np.asarray(A.data)
    col_h = np.asarray(A.col)
    local_diag_col = np.arange(n_loc) + h
    for s in range(S):
        match = col_h[s] == local_diag_col[:, None]
        diag[s * n_loc : (s + 1) * n_loc] = (data_h[s] * match).sum(1)
    dinv = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 0.0)
    dinv_sh = make_global(dinv.reshape(S, n_loc), mesh, P("row", None))
    return P_sh, dinv_sh, P_rows.shape[-1]


@lru_cache(maxsize=64)
def _build_pcycle(
    mesh: Mesh,
    S: int,
    n_loc: int,
    h: int,
    n: int,
    pre: int,
    post: int,
    omega: float,
    res_tol: float,
    max_iter: int,
    singular: bool,
    multilevel: bool,
):
    """Compiled distributed cycle kernel, cached per mesh + config.

    The returned callable takes (data, col, P_sh, b_sh, x_sh, dinv_sh,
    coarse_hierarchy_or_None) and returns (x, conv, err, iters).
    ``multilevel`` switches the coarse correction between the in-kernel
    distributed-RAP + LU (False) and a replicated V-cycle over a passed
    hierarchy (True).
    """
    from mlamg_tpu.mg.cycle import vcycle, _conv_factor

    fwd_perm = [((i - 1) % S, i) for i in range(S)]
    bwd_perm = [((i + 1) % S, i) for i in range(S)]

    def kernel(data, col, Pl, bl, xl, dl, hier):
        data, col, Pl, bl, xl, dl = (
            data[0], col[0], Pl[0], bl[0], xl[0], dl[0]
        )
        sid = jax.lax.axis_index("row")

        def ext(v, fill=0.0):
            return _halo_extend(v, h, S, sid, fwd_perm, bwd_perm, fill)

        def spmv_local(x):
            return jnp.sum(data * ext(x)[col], axis=1)

        if multilevel:

            def coarse_correct(r_H):
                # replicated V-cycle on the coarse chain (identical on
                # every shard; zero communication)
                return vcycle(hier, r_H, jnp.zeros_like(r_H), omega=omega,
                              nu=max(pre, 1))

        else:
            # distributed RAP (AP-then-reduce) + replicated dense LU
            P_ext = ext(Pl)
            AP = jnp.einsum("iw,iwk->ik", data, P_ext[col])
            A_H = jax.lax.psum(Pl.T @ AP, "row")
            lu_piv = jax.scipy.linalg.lu_factor(A_H)

            def coarse_correct(r_H):
                return jax.scipy.linalg.lu_solve(lu_piv, r_H)

        def smooth(x, nu):
            def body(_, x):
                return x + omega * dl * (bl - spmv_local(x))

            return jax.lax.fori_loop(0, nu, body, x)

        err0 = jnp.zeros((max_iter,), xl.dtype)

        def cond(state):
            _, _, i, done = state
            return (~done) & (i < max_iter)

        def body(state):
            x, err, i, _ = state
            x = smooth(x, pre)
            r = bl - spmv_local(x)
            r_H = jax.lax.psum(Pl.T @ r, "row")  # (k,) replicated
            e_H = coarse_correct(r_H)
            x = x + Pl @ e_H
            x = smooth(x, post)
            if singular:
                x = x - jax.lax.psum(jnp.sum(x), "row") / n
            e = jnp.sqrt(jax.lax.psum(jnp.sum((bl - spmv_local(x)) ** 2), "row"))
            err = err.at[i].set(e)
            return x, err, i + 1, e <= res_tol

        x, err, iters, _ = jax.lax.while_loop(
            cond, body, (xl, err0, 0, jnp.bool_(False))
        )
        return x[None, :], _conv_factor(err, iters), err, iters

    return jax.jit(
        jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(
                P("row", None, None),
                P("row", None, None),
                P("row", None, None),
                P("row", None),
                P("row", None),
                P("row", None),
                P(),  # broadcast to every hierarchy leaf (replicated)
            ),
            out_specs=(P("row", None), P(), P(), P()),
            check_vma=False,
        ),
        static_argnums=(),
    )


def _as_sharded(A: PartitionedELL, v, mesh: Mesh):
    if isinstance(v, jax.Array) and v.ndim == 2:
        return v
    return A.shard_x(v, mesh)


def ptwolevel_solve(
    A: PartitionedELL,
    P_rows,
    b,
    x0,
    mesh: Mesh,
    *,
    pre_smoothing_steps: int = 1,
    post_smoothing_steps: int = 1,
    jacobi_weight: float = 0.666,
    res_tol: float = 1e-8,
    max_iter: int = 300,
    singular: bool = False,
):
    """Distributed two-level solve; returns (x (S, n_loc), conv, err, iters).

    Parameters
    ----------
    A : halo-encoded PartitionedELL (rows sharded over mesh's 'row' axis)
    P_rows : (n, k) dense prolongator (full host copy on every process) or
        (S, n_loc, k) pre-sharded rows
    b, x0 : (n,) host vectors or (S, n_loc) sharded arrays
    """
    assert A.halo is not None, "ptwolevel_solve requires a halo-encoded partition"
    P_sh, dinv_sh, k = _prep_fine_level(A, P_rows, mesh)
    fn = _build_pcycle(
        mesh, A.num_shards, A.n_loc, A.halo, A.shape[0],
        pre_smoothing_steps, post_smoothing_steps, jacobi_weight,
        res_tol, max_iter, singular, False,
    )
    data, col = _operands(A, mesh)
    return fn(
        data, col, P_sh, _as_sharded(A, b, mesh), _as_sharded(A, x0, mesh),
        dinv_sh, None,
    )


def pvcycle_solve(
    A: PartitionedELL,
    P0_rows,
    coarse_hierarchy,
    b,
    x0,
    mesh: Mesh,
    *,
    omega: float = 0.666,
    nu: int = 1,
    res_tol: float = 1e-8,
    max_iter: int = 200,
):
    """Distributed multilevel V-cycle solve.

    Level 0 (the only level at scale) is row-partitioned: halo-exchange
    Jacobi smoothing, local residual, one psum restriction.  The coarse
    correction below level 0 runs the *replicated* chain on every shard —
    coarse grids are k=alpha*n and shrink geometrically, so the replicated
    work is negligible while the fine level scales (SURVEY §7.7).

    Parameters
    ----------
    A : halo-encoded PartitionedELL of the fine operator
    P0_rows : (n, k1) dense prolongator level 1 -> 0
    coarse_hierarchy : mg.cycle.Hierarchy over the *coarse* chain whose
        finest operator is A_1 = P0^T A P0 (dense (k1, k1)); or None for a
        two-level cycle where A_1 is formed distributed (AP-then-reduce)
        and LU-solved directly.
    """
    assert A.halo is not None, "pvcycle_solve requires a halo-encoded partition"
    P_sh, dinv_sh, k = _prep_fine_level(A, P0_rows, mesh)
    fn = _build_pcycle(
        mesh, A.num_shards, A.n_loc, A.halo, A.shape[0],
        nu, nu, omega, res_tol, max_iter, False,
        coarse_hierarchy is not None,
    )
    data, col = _operands(A, mesh)
    return fn(
        data, col, P_sh, _as_sharded(A, b, mesh), _as_sharded(A, x0, mesh),
        dinv_sh, coarse_hierarchy,
    )
