"""Strength-of-connection measures.

The reference exposes a menu keyed by name (utils/common.py:25-31):
``abs`` / ``unit`` / ``invabs`` are data transforms; ``evolution`` and
``olson`` delegate to pyamg's C++ evolution measure.  All outputs are used
as *edge distances* for Lloyd/Bellman-Ford aggregation (smaller = nodes
cluster together sooner).

The evolution measure here is a first-party jitted re-design (pyamg is not
a dependency): evolve the identity through ``k`` weighted-Jacobi steps,
restricted to A's sparsity pattern via masked SpGEMM, and convert to a
distance by relative persistence:

    Z    = (I - omega D^-1 A)^k        (pattern-masked, omega = 1/rho(D^-1 A))
    d_ij = |Z_ii| / (|Z_ij| + eps)     (strongly-coupled j -> large |Z_ij|
                                        -> small distance), d_ii = 0.

Composites follow utils/common.py: ``evolution`` = ev + 0.1 * unit,
``olson`` = ev + 1/|a|.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops.matmul import spgemm_masked, spmv


def power_iteration_lmax(A, Dinv=None, iters: int = 30, key=None):
    """Largest eigenvalue (in magnitude) of D^-1 A (or A if Dinv is None)."""
    n = A.shape[0]
    if key is None:
        key = jax.random.PRNGKey(1)
    dtype = A.dtype if isinstance(A, jax.Array) else A.data.dtype
    v = jax.random.normal(key, (n,), dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = spmv(A, v)
        if Dinv is not None:
            w = w * Dinv
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = spmv(A, v)
    if Dinv is not None:
        w = w * Dinv
    return jnp.vdot(v, w) / (jnp.vdot(v, v) + 1e-30)


def evolution_strength(A: CSR, *, k: int = 2, width: int, eps: float = 1e-12) -> CSR:
    """Evolution-based distance matrix on A's pattern (see module docstring).

    ``width`` is the static ELL width bound for A (max row degree).
    """
    n = A.shape[0]
    Dinv = 1.0 / jnp.where(A.diagonal() != 0, A.diagonal(), 1.0)
    lmax = jnp.abs(power_iteration_lmax(A, Dinv))
    omega = 1.0 / jnp.where(lmax > 0, lmax, 1.0)

    # S = I - omega * Dinv A on A's pattern
    live = A.mask
    rsafe = jnp.minimum(A.row, n - 1)
    s_data = -omega * Dinv[rsafe] * A.data
    s_data = jnp.where(live & (A.row == A.col), s_data + 1.0, s_data)
    S = A.with_data(jnp.where(live, s_data, 0.0))

    Z = S
    for _ in range(k - 1):
        Z = spgemm_masked(Z, S, A, a_width=width, b_width=width)

    zdiag = Z.diagonal()
    zii = jnp.abs(zdiag)[rsafe]
    dist = zii / (jnp.abs(Z.data) + eps)
    dist = jnp.where(A.row == A.col, 0.0, dist)
    dist = jnp.where(live, dist, 0.0)
    return A.with_data(dist)


def strength_measure(A: CSR, kind: str = "abs", *, width: int | None = None) -> CSR:
    """Named strength measures, mirroring utils/common.py:25-31."""
    if kind == "abs":
        return A.abs()
    if kind == "unit":
        return A.with_data(jnp.where(A.mask, 1.0, 0.0))
    if kind == "invabs":
        return A.with_data(
            jnp.where(A.mask, 1.0 / jnp.maximum(jnp.abs(A.data), 1e-30), 0.0)
        )
    if kind in ("evolution", "olson"):
        assert width is not None, "evolution measures need a static ELL width"
        ev = evolution_strength(A, width=width)
        if kind == "evolution":
            unit = jnp.where(A.mask, 1.0, 0.0)
            return A.with_data(ev.data + 0.1 * unit)
        inv = jnp.where(A.mask, 1.0 / jnp.maximum(jnp.abs(A.data), 1e-30), 0.0)
        return A.with_data(ev.data + inv)
    raise ValueError(f"unknown strength measure: {kind}")


STRENGTH_MEASURES = ("abs", "unit", "invabs", "evolution", "olson")
