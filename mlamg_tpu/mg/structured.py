"""Structured multilevel hierarchy: every level a DIA stencil, every
prolongator factored — the all-streaming V-cycle for regular-grid problems.

The Galerkin coarse operator of a stencil matrix under box aggregation is
again a stencil matrix on the coarse grid (reach R = ceil(3*r/s) for a
fine reach-r stencil smoothed on both sides).  Rather than running a
general sparse SpGEMM, :func:`dia_galerkin_probe` recovers the coarse
stencil by *colored probing* (the sparse-Jacobian estimation trick): color
the coarse cells on a (2R+1, 2R+1) tile so that no two same-colored cells
share a row of A_H, apply A_H = P^T A P to the (2R+1)^2 probe indicator
vectors — each application is three streaming fine-grid passes — and read
each column's entries out of its probe's image.  No gather, no sort, no
nnz bounds: setup cost is (2R+1)^2 fused SpMV-class passes per level.

Replaces the role of the reference's scipy SpGEMM RAP
(ns/lib/multigrid.py:165) on its structured problem families
(ns/model/data.py:246-298, 435-544); the unstructured path keeps the
static-shape SpGEMM (`ops.matmul.rap_fused`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.dia import DIA
from mlamg_tpu.mg.factored import BilinearP2D, BoxAgg2D, FactoredSA, factored_sa
from mlamg_tpu.mg.coarse import CoarseSolver
from mlamg_tpu.mg.cycle import Hierarchy


def _decompose_offsets(offsets, nx: int):
    """Map DIA offsets o = dy*nx + dx to 2-D displacements (|dx| < nx/2)."""
    out = []
    for o in offsets:
        dx = ((o + nx // 2) % nx) - nx // 2
        dy = (o - dx) // nx
        out.append((dy, dx))
    return out


def dia_galerkin_probe(A: DIA, P) -> DIA:
    """Coarse Galerkin operator P^T A P as a DIA on the coarse grid.

    ``P`` is a :class:`FactoredSA` over a :class:`BoxAgg2D` (aggressive box
    coarsening) or a :class:`BilinearP2D` (geometric side-2 coarsening).
    Jittable; setup-time cost is (2R+1)^2 applications of P^T A P."""
    if isinstance(P, BilinearP2D):
        ny, nx = P.ny, P.nx
        ncy, ncx = P.ncy, P.ncx
    else:
        T = P.T
        assert isinstance(T, BoxAgg2D), "probing requires a structured prolongator"
        ny, nx = T.ny, T.nx
        ncy, ncx = ny // T.sy, nx // T.sx
    k = ncy * ncx

    # fine reach of P^T A P per axis (for FactoredSA each S factor shares
    # A's offsets; for BilinearP2D the stencil support is 3 fine nodes/axis)
    disp = _decompose_offsets(A.offsets, nx)
    ry = max((abs(dy) for dy, _ in disp), default=0)
    rx = max((abs(dx) for _, dx in disp), default=0)
    if isinstance(P, BilinearP2D):
        Ry, Rx = P.coarse_reach(ry, rx)
    else:
        s = P.smooth_steps
        Ry = -(-(2 * s + 1) * ry // T.sy)  # ceil: S^s^T A S^s reach, box-coarsened
        Rx = -(-(2 * s + 1) * rx // T.sx)
    # Linearized offsets Dy*ncx + Dx are only unique (and probe colors only
    # non-aliasing) when the coarse grid exceeds the stencil reach per axis;
    # a narrower grid would double-count duplicate diagonals in later spmv.
    if ncx <= 2 * Rx or ncy <= 2 * Ry:
        raise ValueError(
            f"dia_galerkin_probe: coarse grid ({ncy}, {ncx}) is too narrow "
            f"for the coarse stencil reach ({Ry}, {Rx}) — offsets would "
            "alias; stop coarsening earlier (larger min_coarse) or use a "
            "smaller box side"
        )
    cy_stride, cx_stride = 2 * Ry + 1, 2 * Rx + 1

    iy = jnp.arange(ncy)[:, None]
    ix = jnp.arange(ncx)[None, :]
    color_y = (iy % cy_stride).astype(jnp.int32)
    color_x = (ix % cx_stride).astype(jnp.int32)

    # one probe per color: indicator over same-colored coarse cells
    images = {}
    for cy in range(cy_stride):
        for cx in range(cx_stride):
            probe = ((color_y == cy) & (color_x == cx)).astype(P.dtype)
            from mlamg_tpu.ops import matmul

            y = P.restrict(matmul.spmv(A, P.interp(probe.reshape(k))))
            images[(cy, cx)] = y.reshape(ncy, ncx)

    # read the coarse stencil: A_H[I, I + (Dy, Dx)] = image_{color(I+D)}[I]
    offsets = []
    rows = []
    for Dy in range(-Ry, Ry + 1):
        for Dx in range(-Rx, Rx + 1):
            data = jnp.zeros((ncy, ncx), P.dtype)
            # column J = I + D exists iff in-bounds; its color is fixed per
            # (I color, D) — assemble from the matching probe image slices
            for cy in range(cy_stride):
                for cx in range(cx_stride):
                    jy_color = (cy + Dy) % cy_stride
                    jx_color = (cx + Dx) % cx_stride
                    img = images[(jy_color, jx_color)]
                    mask = (
                        (color_y == cy)
                        & (color_x == cx)
                        & (iy + Dy >= 0)
                        & (iy + Dy < ncy)
                        & (ix + Dx >= 0)
                        & (ix + Dx < ncx)
                    )
                    data = jnp.where(mask, img, data)
            offsets.append(Dy * ncx + Dx)
            rows.append(data.reshape(k))
    return DIA(jnp.stack(rows), tuple(offsets), (k, k))


def build_structured_hierarchy(
    A: DIA,
    ny: int,
    nx: int,
    *,
    sides=(16, 8),
    omega: float = 0.65,
    min_coarse: int = 64,
    coarse_method: str = "inverse",
    block: bool = True,
    smooth_steps=1,
    kind: str = "sa",
    jit_probe: bool = True,
) -> Hierarchy:
    """All-DIA hierarchy for a stencil operator on an (ny, nx) grid.

    ``sides[l]`` is the box side at level l; coarsening stops early when
    the grid no longer divides or k <= min_coarse.  Every prolongator is
    factored (never materialized) and every coarse operator is recovered
    by colored probing — the setup is a fixed number of streaming passes.

    ``kind="sa"`` (default) builds factored smoothed-aggregation
    prolongators over ``sides[l]``-boxes.  ``kind="bilinear"`` builds
    vertex-centered geometric side-2 bilinear prolongators
    (:class:`BilinearP2D`); ``sides`` then only bounds the level count
    (each entry must be 2) and ``smooth_steps``/``omega`` are ignored.
    Galerkin under bilinear stays a compact 9-point stencil at every
    level, so conv reaches geometric-MG territory (~0.1) where large-box
    SA saturates near 0.75.

    ``smooth_steps``: prolongator smoothing factors per level (int, or a
    per-level tuple like ``sides``).  Two factors on the fine level
    (Chebyshev-root weights, see ``factored_sa``) substantially improve
    the coarse-grid correction of large box aggregates at the cost of one
    extra SpMV per interp/restrict; coarse stencils widen accordingly
    (probe reach (2s+1)r).

    ``jit_probe`` wraps each level's Galerkin probe in one jitted program —
    without it the probe's host loops dispatch hundreds of eager ops,
    which over a network-attached device dominates the whole setup.
    """
    from mlamg_tpu.ops.pallas_kernels import blocked_dia

    probe = jax.jit(dia_galerkin_probe) if jit_probe else dia_galerkin_probe

    As = [A]
    Ps = []
    Dinvs = []
    lmaxs = []
    cy, cx = ny, nx
    level_A = A
    steps = (
        tuple(smooth_steps) if np.ndim(smooth_steps) else
        (int(smooth_steps),) * len(sides)
    )
    for side, s_l in zip(sides, steps):
        sy = sx = side
        if kind == "bilinear" and side != 2:
            raise ValueError("kind='bilinear' requires every side to be 2")
        if cy % sy or cx % sx or (cy // sy) * (cx // sx) <= min_coarse:
            break
        d = level_A.diagonal()
        Dinv_l = 1.0 / jnp.where(d != 0, d, 1.0)
        # Gershgorin bound of D^-1 A (rigorous; a power iteration's
        # underestimate can put the true lmax outside the Chebyshev
        # interval and diverge the smoother)
        dat = level_A.data
        if dat.ndim == 3:
            absrow = jnp.sum(jnp.abs(dat), axis=0).reshape(-1)
        else:
            absrow = jnp.sum(jnp.abs(dat), axis=0)
        lmax_l = jnp.max(absrow * jnp.abs(Dinv_l))
        if kind == "bilinear":
            P = BilinearP2D(ny=cy, nx=cx)
        else:
            P = factored_sa(
                level_A, BoxAgg2D(ny=cy, nx=cx, sy=sy, sx=sx),
                omega=None if s_l > 1 else omega,
                smooth_steps=s_l, lmax=lmax_l,
            )
        try:
            A_next = probe(level_A, P)
        except ValueError:
            break  # coarse grid too narrow for the stencil reach — stop here
        Dinvs.append(Dinv_l)
        lmaxs.append(lmax_l)
        cy, cx = cy // sy, cx // sx
        if block and jax.default_backend() == "tpu" and (cy * cx) % 128 == 0:
            A_next = blocked_dia(A_next)
        Ps.append(P)
        As.append(A_next)
        level_A = A_next
    coarse = CoarseSolver.factor(As[-1].todense(), method=coarse_method)
    return Hierarchy(tuple(As[:-1]), tuple(Ps), tuple(Dinvs), coarse,
                     tuple(lmaxs))
