"""Stationary smoothers, built for the VPU (no sequential row sweeps).

The reference smooths with scipy/pyamg Gauss-Seidel (sequential, C++;
ns/lib/multigrid.py:58-99,175,184) and validates a weighted-Jacobi variant
(ns/lib/multigrid.py:213-245).  On TPU the natural basis set is:

- weighted Jacobi (exact parity with the reference's ``jacobi``/
  ``jacobi_torch``, ns/lib/multigrid.py:15-55),
- l1-Jacobi (always-convergent diagonal scaling),
- Chebyshev polynomial smoothing (eigenvalue-bounded, matmul-only),
- multicolor Gauss-Seidel: a graph coloring turns the triangular solve
  into a short static sequence of parallel diagonal updates — the TPU
  answer to sequential GS, used for reference-parity experiments.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.matmul import spmv, spmv_affine


def jacobi(A, b, x, Dinv=None, omega: float = 0.666, nu: int = 2):
    """nu sweeps of weighted Jacobi: x += omega * Dinv * (b - A x)."""
    if Dinv is None:
        d = A.diagonal()
        Dinv = 1.0 / jnp.where(d != 0, d, 1.0)

    def body(_, x):
        return x + omega * Dinv * (b - spmv(A, x))

    return jax.lax.fori_loop(0, nu, body, x)


def l1_jacobi(A, b, x, nu: int = 2):
    """Jacobi with the l1 diagonal d_i = sum_j |a_ij| (unconditionally stable)."""
    n = A.shape[0]
    absrow = jax.ops.segment_sum(jnp.abs(A.data), A.row, num_segments=n)
    Dinv = 1.0 / jnp.where(absrow > 0, absrow, 1.0)

    def body(_, x):
        return x + Dinv * (b - spmv(A, x))

    return jax.lax.fori_loop(0, nu, body, x)


def chebyshev(A, b, x, lmax, lmin_frac: float = 0.25, degree: int = 3, Dinv=None):
    """Chebyshev polynomial smoother on D^-1 A over [lmin_frac*lmax, lmax].

    Standard three-term recurrence (cf. pyamg's chebyshev smoother role in
    the reference stack); only SpMVs and axpys — ideal TPU smoother.
    """
    if Dinv is None:
        d = A.diagonal()
        Dinv = 1.0 / jnp.where(d != 0, d, 1.0)
    lmin = lmax * lmin_frac
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0

    def resid(x):
        # b - A x as one fused streaming pass (the Dinv scale then fuses
        # into the consumer's elementwise chain)
        return Dinv * spmv_affine(A, x, c=b, alpha=-1.0)

    # Chebyshev acceleration (Saad, Iterative Methods, Alg. 12.1) applied to
    # the D^-1-preconditioned system.
    sigma1 = theta / delta
    r = resid(x)
    d = r / theta
    x = x + d
    rho = 1.0 / sigma1

    def body(_, carry):
        x, d, rho = carry
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        r = resid(x)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * r
        return x + d, d, rho_new

    x, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, d, rho))
    return x


def greedy_coloring(A_scipy) -> np.ndarray:
    """Host-side greedy graph coloring (setup phase). Returns (n,) colors."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy)
    n = A.shape[0]
    colors = np.full(n, -1, dtype=np.int32)
    for i in range(n):
        nbrs = A.indices[A.indptr[i] : A.indptr[i + 1]]
        used = set(colors[nbrs[nbrs < i]])
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def multicolor_gauss_seidel(A, b, x, colors: jax.Array, num_colors: int, nu: int = 1):
    """Gauss-Seidel via graph coloring: colors updated in sequence, each
    color's rows in parallel.  Equivalent to a GS sweep under the coloring
    order; ``num_colors`` is static (structured meshes: 2-6 colors).
    """
    d = A.diagonal()
    Dinv = 1.0 / jnp.where(d != 0, d, 1.0)

    def sweep(_, x):
        def per_color(c, x):
            r = b - spmv(A, x)
            upd = x + Dinv * r
            return jnp.where(colors == c, upd, x)

        for c in range(num_colors):
            x = per_color(c, x)
        return x

    return jax.lax.fori_loop(0, nu, sweep, x)
