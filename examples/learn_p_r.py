"""Learn prolongation and restriction separately (role of demos/learn_p_r.py):
P and R values on fixed sparsity patterns optimized by Adam against the
energy-norm two-level error ||R_s (I - P (R A P)^-1 R A) R_s||_F.

    python examples/learn_p_r.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mlamg_tpu.data import Grid
from mlamg_tpu.ops import CSR
from mlamg_tpu.models import R_jacobi
from mlamg_tpu.mg import sa_interpolation_dense, twolevel_solve


def main():
    g = Grid.structured_1d_poisson_dirichlet(24)
    A = CSR.from_scipy(g.A)
    n = g.n
    k = n // 3
    agg = jnp.asarray(np.arange(n) // 3)
    P0 = sa_interpolation_dense(A, agg, k)
    Rs = R_jacobi(A)
    Ad = A.todense()
    mask = (np.asarray(P0) != 0).astype(np.float32)

    def energy(P, R):
        G = jnp.eye(n) - P @ jnp.linalg.solve(R.T @ Ad @ P, R.T @ Ad)
        E = Rs @ G @ Rs
        return jnp.linalg.norm(E, "fro") ** 2

    P = P0
    R = P0  # start Galerkin
    opt = optax.adam(1e-2)
    state = opt.init((P, R))
    vg = jax.jit(jax.value_and_grad(lambda PR: energy(PR[0] * mask, PR[1] * mask)))
    for i in range(150):
        val, grads = vg((P, R))
        upd, state = opt.update(grads, state)
        P, R = optax.apply_updates((P, R), upd)
        if i % 30 == 0:
            print(f"step {i}: energy {float(val):.5f}")

    x0 = np.random.RandomState(0).randn(n)
    x0 /= np.linalg.norm(x0)
    for name, Pm in [("galerkin SA", P0), ("learned P", P * mask)]:
        _, conv, _, it = twolevel_solve(A, Pm, jnp.zeros(n), jnp.asarray(x0, jnp.float32),
                                        res_tol=1e-6, max_iter=200)
        print(f"{name:12s}: conv {float(conv):.4f} ({int(it)} iters)")


if __name__ == "__main__":
    main()
