"""Pallas TPU kernels for the SpMV hot path.

``dia_spmv_pallas`` is the flagship: a blocked DIA (stencil) SpMV where
both HBM streams move by manual double-buffered async copies — diagonal
blocks and the x window (block + halo) for block i+1 are prefetched
while block i computes — and the y blocks ride the automatic output
pipeline.  All compute runs on tile-native 2-D ``(rows, 128)`` layouts
(f32 VREGs are (8, 128); 1-D vectors waste 7/8 of the VPU).

Two measured-on-v5e pitfalls shape the design:

- a ``(D, n)`` f32 array is physically tiled (8, 128) over its last two
  dims, so D=5 pads to 8 sublanes: every DMA from it moves 8/5 of the
  logical bytes, and ``reshape(D, n//128, 128)`` is a full relayout copy
  that XLA does NOT hoist out of solver loops.  The kernel therefore
  consumes a pre-blocked ``(D, n//128, 128)`` operand; ``blocked_dia``
  converts once and solvers reuse it across iterations.
- ``jnp.pad(x)`` before the kernel costs two extra full passes over x
  per call (~25% of the SpMV itself).  For large n the kernel instead
  clamps each block's x-window DMA into [0, n): the window lands at a
  fixed interior offset of a guard-row-padded scratch buffer, needed
  rows are addressed by ``q + delta`` where ``delta`` is the clamp
  shift, and reads that fall on the (zeroed once) guard rows or on
  clamp-shifted x values always multiply the zeros DIA stores where a
  diagonal runs off the matrix.

Shifted reads for diagonal offset ``o`` are a (possibly dynamic) sublane
row slice when ``o % 128 == 0`` and a two-slice lane concat otherwise.

Traffic per row block of R rows: D*R diagonal values + (R + 2H) x values
+ R y values — (D + 2) * 4 bytes per row asymptotically, the SpMV
roofline this kernel is measured against in bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlamg_tpu.ops.dia import DIA


def blocked_dia(A: DIA) -> DIA:
    """Return ``A`` with ``data`` relaid out as ``(D, n/128, 128)``.

    One relayout copy; do this once per solve (outside the iteration
    loop) and every ``dia_spmv_pallas`` call on the result is pure
    streaming.  Requires ``n % 128 == 0``.
    """
    D = len(A.offsets)
    n = A.shape[0]
    if A.data.ndim == 3:
        return A
    assert n % 128 == 0, n
    return DIA(A.data.reshape(D, n // 128, 128), A.offsets, A.shape)


def dia_spmv_pallas(
    A: DIA,
    x: jax.Array,
    c: jax.Array | None = None,
    alpha: float = 1.0,
    block_rows: int = 1 << 15,
    interpret: bool = False,
) -> jax.Array:
    """y = alpha * (A @ x) + c with a blocked Pallas kernel (c optional).

    The affine form makes weighted-Jacobi sweeps (x' = M x + c) and
    residuals (r = b - A x, via alpha=-1, c=b) single streaming passes —
    the V-cycle's entire fine-level work at SpMV cost.  Requires
    n % 128 == 0. ``interpret=True`` runs in the Pallas interpreter
    (CPU tests).
    """
    n = A.shape[0]
    D = len(A.offsets)
    offsets = A.offsets
    NR = n // 128
    H = max((abs(o) for o in offsets), default=0)
    H = ((H + 127) // 128) * 128  # halo row-aligned to the (., 128) layout
    HB = H // 128
    R = min(block_rows, n)
    while n % R != 0:
        R //= 2
    assert R >= 128 and n % R == 0, (n, R)
    RB = R // 128
    WB = RB + 2 * HB  # x-window rows fetched per block (block + halo)
    num_blocks = n // R

    data3 = A.data if A.data.ndim == 3 else A.data.reshape(D, NR, 128)

    # Small problems can't fit a clamped window; pad instead (cheap there).
    pad_mode = NR < WB
    if pad_mode:
        xp = jnp.pad(x, (H, H)).reshape(-1, 128)
        base = 0          # DMA destination row inside the scratch buffer
        rows = WB + 8     # scratch rows (+ slack so the r != 0 extra row fits)
    else:
        xp = x.reshape(NR, 128)
        base = HB
        # clamp shifts move slice starts by up to ±HB beyond the interior
        # positions [HB, 3·HB]; +8 rows of slack for the r != 0 extra row
        rows = RB + 4 * HB + 8

    def kernel(d_hbm, xp_hbm, *rest):
        if c is None:
            y_ref, dbuf, xwin, dsem, xsem = rest
            c_ref = None
        else:
            c_ref, y_ref, dbuf, xwin, dsem, xsem = rest
        i = pl.program_id(0)

        def win_start(blk):
            if pad_mode:
                return blk * RB
            return jnp.clip(blk * RB - HB, 0, NR - WB)

        def xdma(slot, blk):
            return pltpu.make_async_copy(
                xp_hbm.at[pl.ds(win_start(blk), WB), :],
                xwin.at[slot, pl.ds(base, WB), :],
                xsem.at[slot],
            )

        def ddma(slot, blk):
            return pltpu.make_async_copy(
                d_hbm.at[:, pl.ds(blk * RB, RB), :],
                dbuf.at[slot],
                dsem.at[slot],
            )

        @pl.when(i == 0)
        def _():
            # zero the guard rows once: slices may touch them, but only at
            # positions whose diagonal values are the off-matrix zeros
            if base > 0:
                xwin[:, :base, :] = jnp.zeros((2, base, 128), xwin.dtype)
            if rows > base + WB:
                xwin[:, base + WB :, :] = jnp.zeros(
                    (2, rows - base - WB, 128), xwin.dtype
                )
            xdma(0, 0).start()
            ddma(0, 0).start()

        @pl.when(i + 1 < num_blocks)
        def _():
            xdma((i + 1) % 2, i + 1).start()
            ddma((i + 1) % 2, i + 1).start()

        slot = i % 2
        xdma(slot, i).wait()
        ddma(slot, i).wait()

        if pad_mode:
            delta = 0
        else:
            delta = i * RB - HB - win_start(i) + base  # buffer-row correction

        acc = None
        for d, off in enumerate(offsets):
            q, r = divmod(H + off, 128)
            b0 = jnp.int32(q) + delta
            hi = xwin[slot, pl.ds(b0, RB), :]
            if r == 0:
                xs = hi
            else:
                lo = xwin[slot, pl.ds(b0 + 1, RB), :]
                xs = jnp.concatenate([hi[:, r:], lo[:, :r]], axis=1)
            term = dbuf[slot, d] * xs
            acc = term if acc is None else acc + term
        if alpha != 1.0:
            acc = acc * alpha
        if c_ref is not None:
            acc = acc + c_ref[...]
        y_ref[:] = acc

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [data3, xp]
    if c is not None:
        # c streams linearly with y; the automatic pipeline double-buffers it
        in_specs.append(
            pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(c.reshape(NR, 128))

    y2 = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NR, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, D, RB, 128), x.dtype),
            pltpu.VMEM((2, rows, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*operands)
    return y2.reshape(n)
