"""Pallas TPU kernels for the SpMV hot path.

``dia_spmv_pallas`` is the flagship: a blocked DIA (stencil) SpMV that
streams diagonal blocks HBM->VMEM through the pallas pipeline, DMAs each
row-block's x window (block + halo) once into VMEM, and performs all
shifted reads as cheap VMEM slices — avoiding the cross-lane relayout
copies XLA emits for +-1 shifts over full HBM arrays.

Traffic per row block of R rows: D*R diagonal values + (R + 2H) x values
+ R y values — (D + 2) * 4 bytes/row asymptotically, the SpMV roofline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlamg_tpu.ops.dia import DIA


def dia_spmv_pallas(
    A: DIA, x: jax.Array, block_rows: int = 1 << 17, interpret: bool = False
) -> jax.Array:
    """y = A @ x with a blocked Pallas kernel. Requires n % 128 == 0.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    n = A.shape[0]
    D = len(A.offsets)
    offsets = A.offsets
    H = max((abs(o) for o in offsets), default=0)
    # halo aligned so DMA slice sizes/starts meet the 1-D HBM tiling (1024)
    H = ((H + 1023) // 1024) * 1024
    R = min(block_rows, n)
    while n % R != 0:
        R //= 2
    assert R >= 128 and n % R == 0, (n, R)
    W = R + 2 * H

    xp = jnp.pad(x, (H, H))  # (n + 2H,)

    def kernel(data_ref, xp_hbm, y_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(i * R, W)],
            xwin,
            sem,
        )
        cp.start()
        cp.wait()
        acc = None
        for d, off in enumerate(offsets):
            xs = xwin[H + off : H + off + R]
            term = data_ref[d, :] * xs
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(n // R,),
        in_specs=[
            pl.BlockSpec((D, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((W,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(A.data, xp)
