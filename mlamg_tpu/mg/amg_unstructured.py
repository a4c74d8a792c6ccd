"""Large-scale unstructured multilevel SA-AMG: pattern-masked Galerkin RAP
and a factored-prolongator V-cycle.

The reference builds multilevel hierarchies on unstructured random-hull FEM
operators with scipy SpGEMM RAP (ns/lib/multigrid.py:165 on grids from
ns/model/data.py:416-433).  The general static-shape SpGEMM
(`ops.matmul.rap_fused`) pays an nnz * p_width^2 expand plus a device sort
per product — unusable past ~100k dofs.  This module exploits what the
sort-based SpGEMM ignores: for smoothed aggregation the coarse *pattern* is
known ahead of the numerics —

    P = S T,  S = I - omega D^-1 A  (A's pattern),  T = aggregation
    pattern(P)   = A's pattern with columns mapped through agg
    pattern(AP)  = pattern(A) @ pattern(P)            (host boolean spgemm, ms)
    pattern(A_H) = pattern(P)^T @ pattern(AP)

so the numeric triple product runs as two *pattern-masked* SpGEMMs
(`ops.matmul.spgemm_masked`): a dense-shaped gather/contract per known
output entry, no sorting, chunked to bound memory.  Setup is host-driven
(like `mg.cycle.build_hierarchy`); all numeric products run on device.

The V-cycle never materializes P: interpolation/restriction apply the
factors directly (cf. mg/factored.py for the structured path),

    P e   = u - omega * Dinv * (A @ u),   u = e[agg]          (one SpMV)
    P^T r = segment_sum(r - omega * A @ (Dinv * r), agg)      (one SpMV)

(valid for symmetric A, asserted at setup), so every level's work is
SpMV-class streaming through the level's WindowedELL (TPU) or CSR (CPU)
operator.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops import matmul
from mlamg_tpu.mg.coarse import CoarseSolver


# ---------------------------------------------------------------------------
# Pattern computation (host, scipy booleans — milliseconds even at 600k)
# ---------------------------------------------------------------------------


def galerkin_patterns(A_sp, agg: np.ndarray, k: int, smooth_steps: int = 1):
    """(P_pat, AP_pat, AH_pat) scipy boolean patterns for P = S^s T.

    ``A_sp``: scipy CSR (pattern source), ``agg``: (n,) aggregate ids,
    ``smooth_steps`` = s (each smoothing step widens P by one power of
    A's pattern).
    """
    import scipy.sparse as sp

    A_sp = sp.csr_matrix(A_sp)
    n = A_sp.shape[0]
    Bpat = sp.csr_matrix(
        (np.ones(A_sp.nnz, np.float64), A_sp.indices, A_sp.indptr), shape=(n, n)
    )
    coo = A_sp.tocoo()
    Ppat = sp.csr_matrix(
        (np.ones(A_sp.nnz, np.float64), (coo.row, agg[coo.col])), shape=(n, k)
    )
    Ppat.sum_duplicates()
    Ppat.data[:] = 1.0
    for _ in range(smooth_steps - 1):
        Ppat = (Bpat @ Ppat).tocsr()
        Ppat.data[:] = 1.0
    Ppat.sort_indices()
    APpat = (Bpat @ Ppat).tocsr()
    APpat.data[:] = 1.0
    AHpat = (Ppat.T.tocsr() @ APpat).tocsr()
    AHpat.data[:] = 1.0
    AHpat.sort_indices()
    APpat.sort_indices()
    return Ppat, APpat, AHpat


def truncate_lump(A_sp, theta: float, mode: str = "lump_clip"):
    """Drop coarse-operator entries with |a_ij| < theta*sqrt(|a_ii a_jj|).

    Standard Galerkin-product truncation: without it the stencil width of
    SA coarse operators compounds per level (measured: width 13 -> 54 ->
    189 -> 708 over four levels at 600k dofs).  The keep criterion is
    symmetric, so the pattern stays symmetric — REQUIRED by the factored
    restriction (which applies A in place of A^T).  ``mode``:

    - "drop": remove small entries outright (coarse row sums shift by the
      dropped mass; symmetric, diagonals untouched);
    - "lump_clip": additionally lump the dropped (negative) mass onto the
      diagonal to preserve row sums, clipped so no diagonal loses more
      than half its value (unclipped lumping flipped deep-level diagonals
      near zero and diverged the cycle).
    """
    import scipy.sparse as sp

    if theta <= 0:
        return A_sp
    A_sp = sp.csr_matrix(A_sp)
    n = A_sp.shape[0]
    coo = A_sp.tocoo()
    d = np.asarray(A_sp.diagonal(), np.float64)
    scale = np.sqrt(np.abs(d[coo.row] * d[coo.col])) + 1e-30
    diag = coo.row == coo.col
    keep = diag | (np.abs(coo.data) >= theta * scale)
    A2 = sp.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A_sp.shape
    ).tocsr()
    if mode == "lump_clip":
        dropped = np.bincount(
            coo.row, weights=np.where(keep, 0.0, coo.data), minlength=n
        )
        lump = np.maximum(dropped, -0.5 * np.abs(d))
        A2 = (A2 + sp.diags(lump.astype(A_sp.dtype))).tocsr()
    A2.sort_indices()
    return A2


def _auto_chunk(wa: int, wb: int, budget: int = 1 << 22) -> int:
    """Chunk size keeping the (chunk, wa, wb) expansion near ``budget`` elems
    (~16 MB f32 per buffer)."""
    return max(256, budget // max(wa * wb, 1))


def rap_masked(
    A_dev: CSR,
    P_dev: CSR,
    AP_pat: CSR,
    AH_pat: CSR,
    *,
    a_width: int,
    p_width: int,
    pt_width: int,
    ap_width: int,
) -> CSR:
    """Numeric A_H = P^T A P over host-computed patterns (device, no sort).

    ``*_width`` are host-known static row widths: A rows (``a_width``),
    P rows (``p_width``, = a_width when P keeps A's pattern), P columns
    (``pt_width``, duplicates counted), AP rows (``ap_width``).
    """
    AP = matmul.spgemm_masked(
        A_dev, P_dev, AP_pat,
        a_width=a_width, b_width=p_width,
        chunk=_auto_chunk(a_width, p_width),
    )
    Pt = matmul.transpose(P_dev)
    AH = matmul.spgemm_masked(
        Pt, AP, AH_pat,
        a_width=pt_width, b_width=ap_width,
        chunk=_auto_chunk(pt_width, ap_width),
    )
    return AH


def rap_learned(A_dev: CSR, P_dev: CSR, A_sp, agg: np.ndarray, k: int) -> CSR:
    """Galerkin A_H = P^T A P for a *learned* prolongator at scale.

    ``P_dev`` is a P on A's coordinates with aggregate-mapped columns —
    exactly what FullAggNet emits (P = P-hat * Agg keeps A's indptr and
    maps columns through agg, models/agg_interp.py `_phat_times_agg`;
    reference: P = spmm(P_hat, Agg), ns/model/agg_interp.py:484).  Its
    pattern is therefore known host-side without touching the values, so
    the triple product runs as two pattern-masked SpGEMMs (no device
    sort) — the same trick the SA multilevel setup uses — instead of the
    sort-based ``ops.matmul.rap_fused`` whose nnz*width^2 expand+sort is
    ~3.4 Mnnz(A)/s at 65k dofs and unusable at production sizes.

    ``A_sp``/``agg`` are the host-side pattern sources (scipy CSR and the
    (n,) aggregate ids); duplicate (row, agg[col]) coordinates in P_dev
    are summed by the masked contraction, matching scipy semantics.
    """
    import scipy.sparse as sp

    A_sp = sp.csr_matrix(A_sp)
    n = A_sp.shape[0]
    _, APpat, AHpat = galerkin_patterns(A_sp, agg, k, smooth_steps=1)
    a_width = int(np.diff(A_sp.indptr).max())
    pt_width = int(np.bincount(agg[A_sp.tocoo().col], minlength=k).max())
    ap_width = int(np.diff(APpat.indptr).max())
    return rap_masked(
        A_dev, P_dev,
        CSR.from_scipy(APpat, dtype=jnp.float32),
        CSR.from_scipy(AHpat, dtype=jnp.float32),
        a_width=a_width, p_width=a_width,
        pt_width=pt_width, ap_width=ap_width,
    )


# ---------------------------------------------------------------------------
# Hierarchy containers
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Dinv", "agg", "omegas", "lmax"],
    meta_fields=["k"],
)
@dataclasses.dataclass(frozen=True)
class ULevel:
    """One level: operator + factored-P ingredients (see module docstring)."""

    A: Any  # WindowedELL (TPU) or CSR — anything matmul.spmv accepts
    Dinv: jax.Array  # (n,)
    agg: jax.Array  # (n,) int32 aggregate ids in [0, k)
    omegas: jax.Array  # (s,) SA prolongator smoothing weights
    lmax: jax.Array  # spectral bound of D^-1 A (Chebyshev smoothing)
    k: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "coarse"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class UHierarchy:
    levels: Tuple[ULevel, ...]
    coarse: CoarseSolver

    @property
    def num_levels(self) -> int:
        return len(self.levels) + 1


def interp_factored(lev: ULevel, e_H: jax.Array) -> jax.Array:
    """P e_H = prod_i (I - w_i D^-1 A) (e_H injected through the
    aggregation); the factors commute, so application order is free."""
    u = e_H[lev.agg]
    for i in range(lev.omegas.shape[0]):
        u = u - lev.omegas[i] * lev.Dinv * matmul.spmv(lev.A, u)
    return u


def restrict_factored(lev: ULevel, r: jax.Array) -> jax.Array:
    """P^T r for symmetric A: segment-sum of prod_i (I - w_i A D^-1) r."""
    for i in range(lev.omegas.shape[0]):
        r = r - lev.omegas[i] * matmul.spmv(lev.A, lev.Dinv * r)
    return jax.ops.segment_sum(r, lev.agg, num_segments=lev.k)


def uvcycle(
    h: UHierarchy,
    b: jax.Array,
    x: jax.Array,
    *,
    omega_jac: float = 0.666,
    nu: int = 1,
    smoother: str = "chebyshev",
    lmin_frac: float = 1.0 / 30.0,
    gamma: int = 1,
) -> jax.Array:
    """One multigrid cycle (static recursion depth); all levels SpMV-class
    work.

    ``smoother="chebyshev"`` (default) runs a degree-``nu+1`` Chebyshev
    polynomial per pre/post smooth — the strongest SpMV-only smoother on
    TPU (a sequential-GS analogue in smoothing power without the coloring
    passes); ``"jacobi"`` gives ``nu`` weighted-Jacobi sweeps.

    ``gamma=1`` is a V-cycle; ``gamma=2`` a W-cycle.  With the aggressive
    ~10x coarsening of this hierarchy a W-cycle costs only ~1.2x a V-cycle
    (coarse levels are an order of magnitude cheaper each) while holding
    the convergence factor n-independent — the V-cycle with inexact coarse
    correction degrades with depth (the standard aggressive-aggregation
    phenomenon; cf. Notay's AGMG K-cycle).
    """
    from mlamg_tpu.mg.smoothers import chebyshev

    def smooth(lev, b, x):
        if smoother == "chebyshev":
            return chebyshev(
                lev.A, b, x, 1.1 * lev.lmax, lmin_frac=lmin_frac,
                degree=nu + 1, Dinv=lev.Dinv,
            )

        def body(_, x):
            r = matmul.spmv_affine(lev.A, x, c=b, alpha=-1.0)
            return x + omega_jac * lev.Dinv * r

        return jax.lax.fori_loop(0, nu, body, x)

    def descend(l, b, x):
        lev = h.levels[l]
        x = smooth(lev, b, x)
        r = matmul.spmv_affine(lev.A, x, c=b, alpha=-1.0)
        r_H = restrict_factored(lev, r)
        if l + 1 == len(h.levels):
            e_H = h.coarse.solve(r_H)
        else:
            e_H = descend(l + 1, r_H, jnp.zeros_like(r_H))
            for _ in range(gamma - 1):
                e_H = descend(l + 1, r_H, e_H)
        x = x + interp_factored(lev, e_H)
        return smooth(lev, b, x)

    return descend(0, b, x)


def uvcycle_solve(
    h: UHierarchy,
    b: jax.Array,
    x0: jax.Array,
    *,
    res_tol: float = 1e-10,
    max_iter: int = 100,
    omega_jac: float = 0.666,
    nu: int = 1,
    smoother: str = "chebyshev",
    lmin_frac: float = 1.0 / 30.0,
    gamma: int = 1,
):
    """Iterated cycles with the standard conv-factor readout
    (mg/cycle.py semantics).  Returns (x, conv, err, iters)."""
    from mlamg_tpu.mg.cycle import _conv_factor

    A = h.levels[0].A
    err0 = jnp.zeros((max_iter,), x0.dtype)

    def cond(state):
        _, _, i, done = state
        return (~done) & (i < max_iter)

    def body(state):
        x, err, i, _ = state
        x = uvcycle(h, b, x, omega_jac=omega_jac, nu=nu, smoother=smoother,
                    lmin_frac=lmin_frac, gamma=gamma)
        e = jnp.linalg.norm(matmul.spmv_affine(A, x, c=b, alpha=-1.0))
        err = err.at[i].set(e)
        return x, err, i + 1, e <= res_tol

    x, err, iters, _ = jax.lax.while_loop(
        cond, body, (x0, err0, jnp.int32(0), jnp.bool_(False))
    )
    return x, _conv_factor(err, iters), err, iters


# ---------------------------------------------------------------------------
# Setup (host-driven; numeric products on device)
# ---------------------------------------------------------------------------


def build_unstructured_hierarchy(
    A_sp,
    *,
    alpha: float = 0.1,
    max_levels: int = 4,
    min_coarse: int = 800,
    strength_kind: str = "abs",
    lloyd_maxiter: int = 3,
    seed_mode: str = "stride",
    smooth_steps: int = 1,
    trunc_theta: float = 0.02,
    seed: int = 0,
    coarse_method: str = "inverse",
    fmt: str | None = None,
    block_rows: int = 8,
    verbose: bool = False,
    profile_out: dict | None = None,
    rap_mode: str = "auto",
    setup_device: str = "auto",
):
    """SA multilevel setup for a (symmetric) scipy operator at scale.

    Per level: strength -> Lloyd aggregation -> SA omega by Gershgorin ->
    Galerkin RAP.  Level operators are stored RCM-ordered as WindowedELL
    on TPU (``fmt='well'``) or CSR elsewhere; prolongators stay factored.

    ``rap_mode`` selects the Galerkin product: ``"device"`` runs the
    pattern-masked SpGEMMs on the accelerator (host boolean patterns,
    numeric contraction on device — the scalable path); ``"host"`` runs
    the product in scipy.  ``"auto"`` uses the host below ~30M fine-level
    nnz: at that size the numeric contraction is ~1 G-op (seconds either
    way) while each distinct masked-SpGEMM program costs tens of seconds
    of XLA compile per level on a network-attached device (measured 371 s
    of a 462 s setup at 600k dofs — all compile, not compute).

    ``setup_device`` likewise pins the strength/Lloyd phase: ``"cpu"``
    runs it under a CPU ``jax.default_device`` (fast compile, ~1 s of
    compute at 600k), ``"default"`` on the default backend; ``"auto"``
    picks CPU when the default backend is a (remote) TPU and the level is
    small enough that compile dominates.  The cycle itself always runs on
    the default backend.

    Returns (hierarchy, perm) where ``perm`` is the fine-level RCM
    permutation: solve in permuted space, i.e. x = unpermute(solution of
    (PAP^T) y = b[perm]).
    """
    import scipy.sparse as sp
    from mlamg_tpu.graph.lloyd import lloyd_aggregation
    from mlamg_tpu.graph.strength import strength_measure
    from mlamg_tpu import native

    if fmt is None:
        fmt = "well" if jax.default_backend() == "tpu" else "csr"

    A_sp = sp.csr_matrix(A_sp).astype(np.float32)
    if (abs(A_sp - A_sp.T) > 1e-6 * abs(A_sp).max()).nnz:
        raise ValueError(
            "build_unstructured_hierarchy requires a symmetric operator "
            "(the factored restriction applies A in place of A^T)"
        )

    import time as _time

    prof: dict = {}

    def _tick(label, t0):
        prof[label] = prof.get(label, 0.0) + (_time.time() - t0)
        return _time.time()

    key = jax.random.PRNGKey(seed)
    levels = []
    perm0 = None
    level_A = A_sp
    for lvl in range(max_levels - 1):
        t = _time.time()
        n = level_A.shape[0]
        # RCM-order this level (fine level: enables the windowed kernel;
        # coarse levels: keeps aggregate numbering banded for the next one)
        perm = np.asarray(native.rcm_ordering(level_A))
        level_A = level_A[perm][:, perm].tocsr()
        level_A.sort_indices()
        if lvl == 0:
            perm0 = perm
        else:
            # parent's aggregate ids must follow the relabeling
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            prev = levels[-1]
            levels[-1] = dataclasses.replace(
                prev, agg=jnp.asarray(inv[np.asarray(prev.agg)], jnp.int32)
            )

        t = _tick("rcm_reorder", t)
        a_width = int(np.diff(level_A.indptr).max())
        use_host_rap = rap_mode == "host" or (
            rap_mode == "auto" and level_A.nnz < 30_000_000
        )
        use_cpu_setup = setup_device == "cpu" or (
            setup_device == "auto"
            and jax.default_backend() == "tpu"
            and level_A.nnz < 30_000_000
        )
        setup_dev = (
            jax.devices("cpu")[0] if use_cpu_setup else None
        )
        d = np.asarray(level_A.diagonal())
        Dinv = jnp.asarray(1.0 / np.where(d != 0, d, 1.0), jnp.float32)

        if n <= min_coarse:
            break
        k = int(np.ceil(alpha * n))
        from contextlib import nullcontext

        with jax.default_device(setup_dev) if setup_dev else nullcontext():
            A_setup = CSR.from_scipy(level_A, dtype=jnp.float32)
            C = strength_measure(A_setup, strength_kind, width=a_width)
            key, sub = jax.random.split(key)
            if seed_mode == "stride":
                # the level is RCM-ordered, so an index stride is a
                # spatially stratified seeding — measurably better-shaped
                # aggregates (and cycles) than the reference's random
                # permutation seeds
                seeds = np.unique(
                    np.linspace(0, n - 1, k).round().astype(np.int32)
                )
                k = int(seeds.shape[0])
                agg_id, _, _ = lloyd_aggregation(
                    C, maxiter=lloyd_maxiter, seeds=seeds
                )
            else:
                agg_id, _, _ = lloyd_aggregation(
                    C, ratio=alpha, maxiter=lloyd_maxiter, key=sub
                )
            agg = np.asarray(agg_id).copy()  # device sync point
        if use_host_rap:
            A_dev = None  # no default-backend copy needed for a host RAP
        elif use_cpu_setup:
            A_dev = CSR.from_scipy(level_A, dtype=jnp.float32)
        else:
            A_dev = A_setup
        t = _tick("strength_lloyd", t)
        un = agg >= k
        if un.any():
            # nodes unreachable from every seed (isolated by Galerkin
            # truncation or a disconnected operator): exact singleton
            # aggregates
            agg[un] = k + np.arange(int(un.sum()))
            k += int(un.sum())
        # drop empty aggregates (would give zero coarse rows -> singular)
        used = np.unique(agg)
        if used.shape[0] < k:
            remap = np.zeros(k, np.int64)
            remap[used] = np.arange(used.shape[0])
            agg = remap[agg]
            k = int(used.shape[0])

        # rigorous Gershgorin bound of D^-1 A (host, O(nnz)) — a power
        # iteration's underestimate at large n puts the true lmax OUTSIDE
        # the Chebyshev interval and diverges the smoother (observed at
        # 600k dofs; 60k with identical settings converged)
        absrow = np.bincount(
            level_A.tocoo().row,
            weights=np.abs(level_A.tocoo().data), minlength=n,
        )
        lmax = jnp.asarray(
            float(np.max(absrow / np.abs(np.where(d != 0, d, 1.0)))),
            jnp.float32,
        )
        lmax_s = jnp.where(lmax > 0, lmax, 1.0)
        if smooth_steps == 1:
            omegas = ((4.0 / 3.0) / lmax_s)[None]
        else:
            # inverse Chebyshev roots over the smoothed band: the product
            # prod (1 - w_i t) is the minimax degree-s polynomial with
            # p(0)=1 on [lmax/15, lmax] — the same band the cycle smoother
            # targets
            a_b = lmax_s / 15.0
            b_b = lmax_s
            ang = (2.0 * np.arange(1, smooth_steps + 1) - 1) / (2.0 * smooth_steps) * np.pi
            roots = (a_b + b_b) / 2.0 + (b_b - a_b) / 2.0 * jnp.asarray(np.cos(ang), jnp.float32)
            omegas = 1.0 / roots
        if use_host_rap:
            # host scipy prolongator + triple product: at <30M nnz the
            # numeric work is seconds while the device path's per-level
            # masked-SpGEMM programs cost tens of seconds of XLA compile
            # each on a network-attached chip (see docstring)
            import scipy.sparse as _sp

            t = _tick("sa_omegas", t)
            T_host = _sp.csr_matrix(
                (np.ones(n, np.float32), (np.arange(n), agg)), shape=(n, k)
            )
            DinvA = (
                _sp.diags((1.0 / np.where(d != 0, d, 1.0)).astype(np.float32))
                @ level_A
            ).tocsr()
            Psp = T_host
            for w in np.asarray(omegas, np.float64):
                Psp = (Psp - np.float32(w) * (DinvA @ Psp)).tocsr()
            t = _tick("p_smooth", t)
            AH_sp = (Psp.T @ (level_A @ Psp)).tocsr()
            pt_width = ap_width = -1
            t = _tick("rap", t)
        else:
            AH_sp, pt_width, ap_width, t = _device_rap_level(
                level_A, A_dev, agg, k, n, a_width, omegas, Dinv,
                smooth_steps, _tick, t,
            )
        AH_sp.sum_duplicates()
        AH_sp.eliminate_zeros()
        AH_sp = truncate_lump(AH_sp, trunc_theta)
        t = _tick("truncate", t)

        op = _level_operator(level_A, fmt, block_rows)
        t = _tick("repack", t)
        levels.append(
            ULevel(op, Dinv, jnp.asarray(agg, jnp.int32), omegas, lmax, k)
        )
        if verbose:
            print(
                f"level {lvl}: n={n} nnz={level_A.nnz} -> k={k} "
                f"nnz(A_H)={AH_sp.nnz} (widths a={a_width} pt={pt_width} "
                f"ap={ap_width})"
                + (" [host rap]" if use_host_rap else ""),
                flush=True,
            )
        level_A = AH_sp

    t = _time.time()
    coarse = CoarseSolver.factor(
        jnp.asarray(level_A.toarray(), jnp.float32), method=coarse_method
    )
    _tick("coarse_factor", t)
    if profile_out is not None:
        profile_out.update({k_: round(v, 3) for k_, v in prof.items()})
    if verbose:
        print(f"setup profile (s): {dict(sorted(prof.items(), key=lambda kv: -kv[1]))}",
              flush=True)
    return UHierarchy(tuple(levels), coarse), perm0


def _device_rap_level(level_A, A_dev, agg, k, n, a_width, omegas, Dinv,
                      smooth_steps, _tick, t):
    """One level's device-side P build + pattern-masked Galerkin product
    (the ``rap_mode='device'`` path of :func:`build_unstructured_hierarchy`).
    Returns (AH_sp, pt_width, ap_width, t)."""
    from mlamg_tpu.mg.interp import smoothed_aggregation

    P1 = smoothed_aggregation(
        A_dev, jnp.asarray(agg, jnp.int32), k, omega=omegas[0]
    )

    t = _tick("sa_omegas", t)
    Ppat, APpat, AHpat = galerkin_patterns(
        level_A, agg, k, smooth_steps=smooth_steps
    )
    t = _tick("patterns_host", t)
    if smooth_steps == 1:
        P_dev = P1
        p_width = a_width
    else:
        # widen P step by step: P_{j+1} = P_j - w_{j+1} D^-1 A P_j on
        # the host-known pattern B^j @ P1pat; P_j's entries inject by a
        # host-computed position map (P_j pattern is a subset)
        import scipy.sparse as _sp

        coo0 = level_A.tocoo()
        pat_j = _sp.csr_matrix(
            (np.ones(level_A.nnz, np.float64), (coo0.row, agg[coo0.col])),
            shape=(n, k),
        )
        pat_j.sum_duplicates()
        pat_j.data[:] = 1.0
        pat_j.sort_indices()
        Bpat = _sp.csr_matrix(
            (np.ones(level_A.nnz, np.float64), level_A.indices,
             level_A.indptr), shape=(n, n),
        )
        P_dev = P1
        # device P1 lives on A's (row, col->agg) coordinates
        key1_dev = (coo0.row.astype(np.int64) * (k + 1)
                    + agg[coo0.col].astype(np.int64))
        for j in range(1, smooth_steps):
            pat_next = (Bpat @ pat_j).tocsr()
            pat_next.data[:] = 1.0
            pat_next.sort_indices()
            nxt_coo = pat_next.tocoo()
            keys_next = (nxt_coo.row.astype(np.int64) * (k + 1)
                         + nxt_coo.col.astype(np.int64))
            pj_width = int(np.diff(pat_j.indptr).max()) if j > 1 else a_width
            pat_next_dev = CSR.from_scipy(pat_next, dtype=jnp.float32)
            APj = matmul.spgemm_masked(
                A_dev, P_dev, pat_next_dev,
                a_width=a_width, b_width=pj_width,
                chunk=_auto_chunk(a_width, pj_width),
            )
            rsafe = jnp.minimum(APj.row, n - 1)
            base = jnp.where(
                APj.mask, -omegas[j] * Dinv[rsafe] * APj.data, 0.0
            )
            if j == 1:
                pos = np.searchsorted(keys_next, key1_dev)
            else:
                cj = pat_j.tocoo()
                keys_j = (cj.row.astype(np.int64) * (k + 1)
                          + cj.col.astype(np.int64))
                pos = np.searchsorted(keys_next, keys_j)
            # P_dev may carry padded tail slots; route them to a dump
            # index (mode="drop")
            pos_full = np.full(P_dev.data.shape[0], base.shape[0], np.int64)
            pos_full[: pos.shape[0]] = pos
            data = base.at[jnp.asarray(pos_full)].add(
                P_dev.data, mode="drop"
            )
            P_dev = APj.with_data(data)
            pat_j = pat_next
        p_width = int(np.diff(pat_j.indptr).max())
    jax.block_until_ready(P_dev.data)
    t = _tick("p_smooth", t)

    pt_width = int(
        np.bincount(agg[level_A.tocoo().col], minlength=k).max()
    ) if smooth_steps == 1 else int(
        np.diff(Ppat.tocsc().indptr).max()
    )
    ap_width = int(np.diff(APpat.indptr).max())
    if pt_width * ap_width <= 32768:
        # device pattern-masked triple product (the large fine levels,
        # where the numerics dominate setup)
        AH = rap_masked(
            A_dev, P_dev,
            CSR.from_scipy(APpat, dtype=jnp.float32),
            CSR.from_scipy(AHpat, dtype=jnp.float32),
            a_width=a_width, p_width=p_width,
            pt_width=pt_width, ap_width=ap_width,
        )
        AH_sp = AH.to_scipy().tocsr()
    else:
        # deep coarse levels grow wide aggregate supports; the masked
        # contraction's (chunk, pt, ap) expansion would exceed HBM, and
        # at these sizes (nnz a few M) a host product is milliseconds
        Psp = P_dev.to_scipy().tocsr()
        Psp.sum_duplicates()
        AH_sp = (Psp.T @ level_A @ Psp).tocsr()
    t = _tick("rap", t)
    return AH_sp, pt_width, ap_width, t


def _level_operator(A_sp, fmt: str, block_rows: int):
    if fmt == "well":
        from mlamg_tpu.ops.unstructured import WindowedELL

        return WindowedELL.from_scipy(A_sp, block_rows=block_rows)
    return CSR.from_scipy(A_sp, dtype=jnp.float32)
