"""C/F splitting by diagonal dominance.

Two implementations of the reference's ``greedy_coarsening``
(ns/lib/greedy.py:13-36):

- :func:`greedy_coarsening` — faithful sequential semantics, vectorized
  numpy on host (setup-phase only; the reference runs it once per
  preconditioner build, ns/preconditioner/MLAMG.py:116).
- :func:`greedy_coarsening_parallel` — a jitted Luby-style variant that
  picks local dominance minima as C points in parallel rounds; same
  qualitative splitting, O(rounds) segment ops, usable on-device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def diag_dominance(A) -> np.ndarray:
    """|a_ii| / sum_j |a_ij| per row (numpy, matches ns/lib/greedy.py:4-10)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    absA = abs(A)
    rowsum = np.asarray(absA.sum(axis=1)).ravel()
    return np.abs(A.diagonal()) / rowsum


def greedy_coarsening(A, theta: float):
    """Sequential greedy C/F splitting (host-side oracle-parity version).

    Returns (num_F, F, C) exactly as the reference (ns/lib/greedy.py:13-36):
    rows with dominance >= theta start as F; repeatedly promote the least
    dominant undecided row to C, recompute its undecided neighbours'
    dominance against (U ∪ F), moving any that cross theta into F.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    dominance = diag_dominance(A)
    absA = abs(A).tocsr()
    diag = np.abs(A.diagonal())

    state = np.zeros(n, dtype=np.int8)  # 0=U, 1=F, 2=C
    state[dominance >= theta] = 1

    undecided = state == 0
    while undecided.any():
        u_idx = np.where(undecided)[0]
        c = u_idx[np.argmin(dominance[u_idx])]
        state[c] = 2
        undecided[c] = False
        # update undecided neighbours of c
        nbrs = absA.indices[absA.indptr[c] : absA.indptr[c + 1]]
        for i in nbrs:
            if state[i] != 0:
                continue
            cols = absA.indices[absA.indptr[i] : absA.indptr[i + 1]]
            vals = absA.data[absA.indptr[i] : absA.indptr[i + 1]]
            keep = state[cols] != 2  # entries over U ∪ F
            denom = vals[keep].sum()
            dominance[i] = diag[i] / denom if denom > 0 else np.inf
            if dominance[i] >= theta:
                state[i] = 1
                undecided[i] = False
    F = np.where(state == 1)[0]
    C = np.where(state == 2)[0]
    return len(F), F, C


def greedy_coarsening_parallel(A_csr, theta: float, max_rounds: int = 64):
    """Jitted parallel C/F splitting (Luby-style local-minimum selection).

    Each round, every undecided node that is a strict dominance minimum among
    its undecided neighbourhood becomes C simultaneously; neighbours whose
    recomputed dominance crosses ``theta`` become F.  Converges in
    O(log n) expected rounds on bounded-degree graphs.

    Returns (state,) with 1 = F, 2 = C per node (device array).
    """
    n = A_csr.shape[0]
    live = A_csr.row < n
    r = jnp.minimum(A_csr.row, n - 1)
    c = A_csr.col
    absdata = jnp.abs(A_csr.data) * live
    diag = A_csr.diagonal()
    absdiag = jnp.abs(diag)
    rowsum = jax.ops.segment_sum(absdata, A_csr.row, num_segments=n)
    dom0 = absdiag / jnp.where(rowsum > 0, rowsum, 1.0)

    # jitter for unique local minima (deterministic)
    tie = (
        jax.random.uniform(jax.random.PRNGKey(0), (n,), dtype=dom0.dtype) * 1e-9
    )
    state0 = jnp.where(dom0 >= theta, 1, 0).astype(jnp.int8)

    def body(_, carry):
        state, dom = carry
        und = state == 0
        key = jnp.where(und, dom + tie, jnp.inf)
        # node is selected if it's <= all undecided neighbours' keys
        nb_min_in = jax.ops.segment_min(
            jnp.where(und[r] & live, key[r], jnp.inf), c, num_segments=n
        )
        nb_min_out = jax.ops.segment_min(
            jnp.where(und[c] & live, key[c], jnp.inf), r, num_segments=n
        )
        nb_min = jnp.minimum(nb_min_in, nb_min_out)
        selected = und & (key <= nb_min)
        state = jnp.where(selected, jnp.int8(2), state)
        # recompute dominance over entries whose column is not C
        col_notC = state[c] != 2
        denom = jax.ops.segment_sum(
            jnp.where(col_notC, absdata, 0.0), A_csr.row, num_segments=n
        )
        dom = absdiag / jnp.where(denom > 0, denom, 1.0)
        state = jnp.where((state == 0) & (dom >= theta), jnp.int8(1), state)
        return state, dom

    state, _ = jax.lax.fori_loop(0, max_rounds, body, (state0, dom0))
    # anything left undecided becomes F (diagonally dominant enough rows won)
    state = jnp.where(state == 0, jnp.int8(1), state)
    return state
